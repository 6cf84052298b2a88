"""Read-through fetch cache — the distributed form of the reference's
CacheManager (/root/reference/src/shared/cache.ts:6-46) and the engine's
resume-without-refetch primitive.

Reference semantics preserved:
- canonical cache key = ``namespace + ':' + sha256(stableStringify({parts,
  url}))`` (cache.ts:48-105) — here a pure Catalyst ``sha2(concat(...))``
  over the same canonical JSON shape, so keys match the Python scalar
  ``textops.create_cache_key`` byte-for-byte,
- read-through: cache hit ⇒ skip the fetch (simple.ts:79-85) ⇒ LEFT JOIN
  on the key, fetch only the null side, union,
- TTL: ``cacheExpiry`` ms (types.ts:142, floor-to-seconds cache.ts:22) ⇒ an
  expiry predicate at join time — expired rows count as misses; no state
  store needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def col_cache_key(url_col: Column | str, namespace: str = "fetch", parts: list | None = None) -> Column:
    """Catalyst expression equal to ``textops.create_cache_key(namespace,
    url, parts)`` byte-for-byte: parts (config literals, not columns) are
    double-encoded driver-side exactly like normalizeCacheKeyPart
    (cache.ts:62-68), and the url is JSON-string-escaped JVM-side
    (backslash, quote). Canonical http(s) URLs contain no raw control
    characters (the WHATWG canonicalizer strips/percent-encodes them), so
    the two-character escape set is exhaustive for this column."""
    from .textops import _js_json_str, normalize_cache_key_part

    url = F.col(url_col) if isinstance(url_col, str) else url_col
    sig_parts = [p for p in map(normalize_cache_key_part, parts or []) if p is not None]
    parts_json = "[" + ",".join(_js_json_str(p) for p in sig_parts) + "]"
    url_esc = F.replace(
        F.replace(url, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
    )
    payload = F.concat(F.lit('{"parts":' + parts_json + ',"url":"'), url_esc, F.lit('"}'))
    return F.concat(F.lit(namespace + ":"), F.sha2(payload, 256))


def read_through(
    frontier: DataFrame,
    fetch_cache: DataFrame | None,
    url_col: str = "url_canon",
    namespace: str = "fetch",
    ttl_ms: int | None = 300_000,
    now: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split the frontier into (hits, misses) against the cache table.

    ``fetch_cache`` schema: (cache_key string, cached_at timestamp, payload
    columns...). Hits carry the cache payload; misses are frontier rows to
    fetch. TTL mirrors cacheExpiry: a stale hit is a miss.

    One broadcast-or-shuffle hash join on the 256-bit key; at 10^10 scale
    both sides are hash-partitioned on cache_key so the join co-locates."""
    keyed = frontier.withColumn("cache_key", col_cache_key(url_col, namespace))
    if fetch_cache is None:
        return keyed.limit(0), keyed
    # hit/miss is probed on the non-null 'cached_at' column BY NAME — a
    # positional probe silently misclassifies if the payload column order
    # differs or the payload itself is nullable (ADVICE r01)
    if "cached_at" not in fetch_cache.columns:
        raise ValueError("fetch_cache table must have a 'cached_at' timestamp column")
    if "cached_at" in frontier.columns:
        raise ValueError("frontier must not carry a 'cached_at' column (probe would be ambiguous)")
    cache = fetch_cache
    if ttl_ms is not None:
        now = now if now is not None else F.current_timestamp()
        # floor-to-seconds TTL like cache.ts:22
        fresh = F.col("cached_at") >= (now - F.expr(f"INTERVAL {ttl_ms // 1000} SECOND"))
        cache = cache.filter(fresh)
    joined = keyed.join(cache, "cache_key", "left")
    hits = joined.filter(F.col("cached_at").isNotNull())
    misses = joined.filter(F.col("cached_at").isNull()).select(*keyed.columns)
    return hits, misses


def write_back(fetched: DataFrame, url_col: str = "url_canon",
               namespace: str = "fetch", now: Column | None = None) -> DataFrame:
    """Rows to append/MERGE into fetch_cache after a fetch round
    (write-through, simple.ts:134-136)."""
    now = now if now is not None else F.current_timestamp()
    return fetched.withColumn("cache_key", col_cache_key(url_col, namespace)).withColumn(
        "cached_at", now
    )
