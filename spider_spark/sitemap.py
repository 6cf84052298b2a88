"""Sitemap ingestion (sitemaps.org protocol): ``<urlset>`` /
``<sitemapindex>`` XML → seed rows for the frontier, pure Catalyst.

The reference discovers URLs only by extracting links from fetched pages
(src/shared/links.ts); a crawl engine at Common-Crawl scale also ingests
the hosts' declared URL inventories. Sitemaps are simple, rigid XML, so
extraction stays entirely in whole-stage codegen (``regexp_extract_all``
over ``<url>``/``<sitemap>`` blocks, per-block field regexes, the 5
predefined XML entities unescaped with ``&amp;`` last) — no Python in the
path, scan-speed over any number of sitemap bodies.

A ``sitemapindex`` row's ``loc`` is itself a sitemap URL — the caller
enqueues those for fetching (the sitemap analog of a frontier tick) while
``urlset`` locs go straight to ``seeds_to_frontier``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_URL_BLOCK = r"(?s)<url[\s>](.*?)</url>"
_SITEMAP_BLOCK = r"(?s)<sitemap[\s>](.*?)</sitemap>"


def xml_unescape(c: Column) -> Column:
    """Decode the 5 predefined XML entities. ``&amp;`` is decoded LAST —
    the inverse of escape order — so ``&amp;lt;`` yields the literal
    ``&lt;`` instead of double-decoding to ``<``. (Deliberately NOT the
    reference's HTML 5-entity chain, which decodes ``&#039;`` and runs in
    source order — this is the XML spec's entity set.)"""
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _field(block: Column, tag: str) -> Column:
    raw = F.regexp_extract(block, rf"(?s)<{tag}>\s*(.*?)\s*</{tag}>", 1)
    return F.nullif(xml_unescape(raw), F.lit(""))


def sitemap_entries(df: DataFrame, xml_col: str = "xml", id_cols: tuple[str, ...] = ("url",)) -> DataFrame:
    """Explode sitemap XML bodies into one row per declared URL.

    Output columns: ``*id_cols, sitemap_kind ('urlset'|'sitemapindex'),
    pos (document order), loc, lastmod, changefreq, priority (double)``.
    Rows without a ``<loc>`` are dropped (spec: loc is required); documents
    that are not sitemaps produce no rows."""
    xml = F.col(xml_col)
    kind = (
        F.when(xml.rlike(r"(?s)<urlset[\s>]"), F.lit("urlset"))
        .when(xml.rlike(r"(?s)<sitemapindex[\s>]"), F.lit("sitemapindex"))
        .otherwise(F.lit(None).cast("string"))
    )
    blocks = (
        F.when(kind == "urlset", F.regexp_extract_all(xml, F.lit(_URL_BLOCK), F.lit(1)))
        .when(kind == "sitemapindex", F.regexp_extract_all(xml, F.lit(_SITEMAP_BLOCK), F.lit(1)))
        .otherwise(F.array().cast("array<string>"))
    )
    b = df.select(
        *id_cols,
        kind.alias("sitemap_kind"),
        F.posexplode(blocks).alias("pos", "_block"),
    )
    blk = F.col("_block")
    return (
        b.select(
            *id_cols,
            "sitemap_kind",
            "pos",
            _field(blk, "loc").alias("loc"),
            _field(blk, "lastmod").alias("lastmod"),
            _field(blk, "changefreq").alias("changefreq"),
            # try_cast: real-world sitemaps contain garbage priorities, and
            # Spark 4 runs ANSI by default — a plain cast would abort the
            # whole extraction job on one bad row instead of yielding NULL
            _field(blk, "priority").try_cast("double").alias("priority"),
        )
        .filter(F.col("loc").isNotNull())
    )


def urlset_seed_urls(entries: DataFrame) -> DataFrame:
    """Frontier-ready seeds from extracted entries: ``urlset`` locs only,
    highest sitemap priority first (spec default 0.5), keep-first on loc.
    Returns (url, sitemap_priority) — feed ``url`` to
    ``frontier.seeds_to_frontier`` (which canonicalizes, hashes, and
    dead-letters invalid rows)."""
    from pyspark.sql import Window

    w = Window.partitionBy("loc").orderBy(F.desc("priority"), "pos")
    return (
        entries.filter(F.col("sitemap_kind") == "urlset")
        .withColumn("priority", F.coalesce(F.col("priority"), F.lit(0.5)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("loc").alias("url"), F.col("priority").alias("sitemap_priority"))
    )


# sitemaps.org changefreq → refresh period. "always" means every visit
# (period 0); "never" advertises no refresh — excluded from the map, so
# such entries are never stale-candidates (lastmod can still trigger).
CHANGEFREQ_HOURS = {
    "always": 0,
    "hourly": 1,
    "daily": 24,
    "weekly": 168,
    "monthly": 720,
    "yearly": 8760,
}


def revalidation_candidates(
    entries: DataFrame,
    last_crawl: DataFrame,
    now: str,
    url_col: str = "url",
    crawled_at_col: str = "last_crawled_at",
) -> DataFrame:
    """Sitemap-driven recrawl selection: which declared URLs deserve a
    (re)fetch, per the sitemaps.org metadata the host itself publishes.

    ``entries`` is ``sitemap_entries`` output (urlset rows are used);
    ``last_crawl`` maps url → last-capture timestamp; ``now`` is an
    explicit ``'YYYY-MM-DD HH:MM:SS'`` literal — deterministic jobs never
    call the clock. One row per candidate URL with a first-match-wins
    reason, mirroring the engine's detector-chain style:

    - ``never_crawled`` — declared in the sitemap, absent from last_crawl.
    - ``modified`` — ``lastmod`` (authoritative when present, per spec)
      parses to a timestamp newer than the last capture.
    - ``stale_changefreq`` — no usable lastmod, but the entry's changefreq
      period (CHANGEFREQ_HOURS) has elapsed since the last capture.

    URLs failing all three are up to date and produce no row. Scale shape:
    one groupBy(loc) partial agg over the (already exploded) entries, one
    join against last_crawl on the URL key — both shuffle-friendly; no
    windows, no driver state. Feed the result to ``Crawler.requeue_urls``
    (seen URLs) or ``frontier.seeds_to_frontier`` (never_crawled)."""
    now_ts = F.to_timestamp(F.lit(now))
    hours_map = F.create_map(
        *[F.lit(x) for kv in CHANGEFREQ_HOURS.items() for x in kv]
    )
    per_loc = (
        entries.filter(F.col("sitemap_kind") == "urlset")
        .select(
            F.col("loc"),
            F.try_to_timestamp(F.col("lastmod")).alias("_lm"),
            F.lower(F.col("changefreq")).alias("_cf"),
        )
        .groupBy("loc")
        .agg(
            F.max("_lm").alias("lastmod_ts"),
            F.min(hours_map[F.col("_cf")]).alias("_cf_hours"),
        )
    )
    joined = per_loc.join(
        last_crawl.select(
            F.col(url_col).alias("loc"), F.col(crawled_at_col).alias("last_crawled_at")
        ),
        "loc",
        "left",
    )
    la = F.col("last_crawled_at")
    reason = (
        F.when(la.isNull(), F.lit("never_crawled"))
        .when(F.col("lastmod_ts").isNotNull() & (F.col("lastmod_ts") > la), F.lit("modified"))
        .when(
            F.col("lastmod_ts").isNull()
            & F.col("_cf_hours").isNotNull()
            & (now_ts >= F.timestamp_add("HOUR", F.col("_cf_hours"), la)),
            F.lit("stale_changefreq"),
        )
    )
    return (
        joined.withColumn("reason", reason)
        .filter(F.col("reason").isNotNull())
        .select(F.col("loc").alias("url"), "reason", "lastmod_ts", "last_crawled_at")
    )
