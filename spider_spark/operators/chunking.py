"""Content-defined chunking (CDC) for sub-document byte dedup.

Crawls re-fetch near-identical payloads constantly (a page whose footer
timestamp changed, a syndicated article with one injected ad block). Whole
-document hashing (dedup.py) sees those as distinct; CDC splits each
payload at boundaries chosen by the CONTENT (a rolling window hash hitting
a mask), so an insertion only perturbs the chunks it touches and every
chunk after the edit re-aligns — the LBFS insight (Muthitacharoen et al.
2001, "A Low-Bandwidth Network File System"; min/max clamping per FastCDC,
Xia et al. 2016). Shared chunks across captures/documents then fall out of
a plain hash census, giving delta-storage estimates and "what actually
changed" diffs without any pairwise comparison.

Boundary rule (window-hash CDC): position i ends a chunk when the
polynomial hash of the w=16 bytes ending at i satisfies
``hash & (2^mask_bits - 1) == 0``, subject to min/max chunk clamps
(a boundary inside ``min_size`` of the previous cut is ignored; a chunk
reaching ``max_size`` is cut unconditionally). The hash depends ONLY on
those 16 bytes — boundaries are content-local, which is the whole
resynchronization property (tested: prepending bytes preserves most chunk
hashes; fixed-size chunking preserves none).

Scale shape (100 TB): chunking is one mapInPandas pass — per doc the
rolling hash is 16 shifted numpy uint64 vector ops (never a per-byte
Python loop; the only Python-level loop is over the SPARSE candidate
boundary list). The cross-doc census is a groupBy on chunk_hash with
map-side partial aggregation; corpus stats partial-aggregate to one row.
The fixed-size sibling (``fixed_chunk_stats``) is pure Catalyst and
exists as the engine-portable oracle anchor for the census arithmetic.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cdc_boundaries",
    "cdc_chunks",
    "chunk_table",
    "chunk_dedup_stats",
    "fixed_chunk_stats",
]

_WINDOW = 16
# odd multiplier for the degree-15 polynomial hash; value is arbitrary but
# FROZEN — changing it reshuffles every boundary (a format break)
_P = np.uint64(0x9E3779B97F4A7C15)
_COEF = np.array(
    [int(pow(int(_P), _WINDOW - 1 - j, 1 << 64)) for j in range(_WINDOW)],
    dtype=np.uint64,
)


def cdc_boundaries(
    data: bytes, mask_bits: int = 6, min_size: int = 32, max_size: int = 1024
) -> list[int]:
    """Chunk END offsets (exclusive) for ``data``; last offset == len(data).
    Average chunk ≈ 2^mask_bits bytes between the clamps."""
    if mask_bits < 1 or min_size < 1 or max_size <= min_size:
        raise ValueError("need mask_bits >= 1 and max_size > min_size >= 1")
    n = len(data)
    if n == 0:
        return []
    if n <= _WINDOW:
        return [n]
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    m = n - _WINDOW + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(_WINDOW):
        h += _COEF[j] * arr[j : j + m]  # uint64 wraparound is the modulus
    mask = np.uint64((1 << mask_bits) - 1)
    # candidate boundary AFTER byte i (window data[i-15..i]); index into h
    # is i - (WINDOW-1), so candidate end offsets are hits + WINDOW
    cands = np.nonzero((h & mask) == 0)[0] + _WINDOW
    ends: list[int] = []
    prev = 0
    ci = 0
    nc = len(cands)
    while prev < n:
        # min clamp: ignore content boundaries too close to the last cut
        while ci < nc and cands[ci] < prev + min_size:
            ci += 1
        if ci < nc and cands[ci] < n and cands[ci] <= prev + max_size:
            prev = int(cands[ci])  # content-defined cut
            ci += 1
        elif n - prev > max_size:
            prev = prev + max_size  # max clamp: forced cut
        else:
            prev = n  # tail chunk (may be < min_size — last chunk exempt)
        ends.append(prev)
    return ends


def cdc_chunks(
    data: bytes, mask_bits: int = 6, min_size: int = 32, max_size: int = 1024
) -> list[tuple[int, int, str]]:
    """(offset, length, md5-hex) per chunk; concatenation tiles ``data``."""
    out = []
    prev = 0
    for end in cdc_boundaries(data, mask_bits, min_size, max_size):
        out.append((prev, end - prev, hashlib.md5(data[prev:end]).hexdigest()))
        prev = end
    return out


def _chunk_factory(
    bytes_name: str, id_name: str, id_dtype: str, mask_bits, min_size, max_size
):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens, hashes = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_name], pdf[bytes_name]):
                if payload is None:
                    continue
                raw = bytes(payload)
                for i, (off, ln, h) in enumerate(
                    cdc_chunks(raw, mask_bits, min_size, max_size)
                ):
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(off)
                    lens.append(ln)
                    hashes.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype=id_dtype),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "offset": pd.Series(offs, dtype="int64"),
                    "length": pd.Series(lens, dtype="int64"),
                    "chunk_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return run


def chunk_table(
    df: DataFrame,
    bytes_col: str = "content",
    id_col: str = "doc_id",
    mask_bits: int = 6,
    min_size: int = 32,
    max_size: int = 1024,
    id_type: str = "long",
) -> DataFrame:
    """One row per CDC chunk: (doc_id, chunk_idx, offset, length,
    chunk_hash). Null payloads contribute no rows. Chunking is per-row
    independent — map-only, no shuffle. ``id_type`` is "long" (numeric
    doc ids) or "string" (URLs)."""
    if id_type not in ("long", "string"):
        raise ValueError("id_type must be 'long' or 'string'")
    keyed = df.select(
        F.col(id_col).cast(id_type).alias("doc_id"), F.col(bytes_col)
    )
    pd_dtype = "int64" if id_type == "long" else "object"
    return keyed.mapInPandas(
        _chunk_factory(bytes_col, "doc_id", pd_dtype, mask_bits, min_size, max_size),
        schema=f"doc_id {id_type}, chunk_idx int, offset long, length long,"
        " chunk_hash string",
    )


def chunk_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Corpus-level delta-storage estimate over a chunk table: one row —
    total vs distinct chunks/bytes and the dedup ratio (bytes stored once
    / bytes scanned). Distinct bytes counts each chunk_hash's length once
    (same hash ⇒ same bytes ⇒ same length)."""
    per_hash = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("copies"), F.min("length").alias("length")
    )
    return per_hash.agg(
        F.sum("copies").cast("long").alias("total_chunks"),
        F.count(F.lit(1)).cast("long").alias("distinct_chunks"),
        F.sum(F.col("copies") * F.col("length")).cast("long").alias("total_bytes"),
        F.sum("length").cast("long").alias("distinct_bytes"),
        F.round(
            F.sum("length")
            / F.when(
                F.sum(F.col("copies") * F.col("length")) > 0,
                F.sum(F.col("copies") * F.col("length")),
            ),
            6,
        ).alias("dedup_ratio_r"),
    )


def capture_delta_stats(
    prev: DataFrame,
    curr: DataFrame,
    bytes_col: str = "content",
    id_col: str = "url",
    mask_bits: int = 6,
    min_size: int = 32,
    max_size: int = 1024,
) -> DataFrame:
    """Per-URL recrawl byte delta: CDC-chunk two consecutive captures and
    compare chunk MULTISETS — shared bytes = Σ_hash min(copies) · len.
    This is the number recrawl scheduling actually wants: a page whose
    footer timestamp ticked shares ~all chunks (changed_frac ≈ 0, stop
    refetching it so often); a rewritten page shares none. Whole-capture
    fingerprints (change_rate's fp) can only say CHANGED; this says how
    much.

    URLs present in only one capture report the other side as 0 bytes
    (changed_frac 1.0 — appeared or vanished content is all-change).
    Scale shape: chunking is map-only per side; the compare is ONE
    (url, chunk_hash)-keyed full-outer join of two partial-agg censuses
    — shuffle ∝ distinct chunks, co-partitioned on the same key. Output:
    (url, prev_bytes, curr_bytes, shared_bytes, changed_frac_r) where
    changed_frac is against the LARGER side (symmetric)."""

    def census(df: DataFrame) -> DataFrame:
        return (
            chunk_table(
                df, bytes_col, id_col, mask_bits, min_size, max_size,
                id_type="string",
            )
            .groupBy(F.col("doc_id").alias("_id"), "chunk_hash")
            .agg(F.count(F.lit(1)).alias("n"), F.min("length").alias("len"))
        )

    p = census(prev).select(
        "_id", "chunk_hash", F.col("n").alias("pn"), F.col("len").alias("plen")
    )
    c = census(curr).select(
        "_id", "chunk_hash", F.col("n").alias("cn"), F.col("len").alias("clen")
    )
    j = p.join(c, ["_id", "chunk_hash"], "full_outer").select(
        "_id",
        F.coalesce(F.col("pn"), F.lit(0)).alias("pn"),
        F.coalesce(F.col("cn"), F.lit(0)).alias("cn"),
        F.coalesce(F.col("plen"), F.col("clen")).alias("len"),
    )
    per = j.groupBy("_id").agg(
        F.sum(F.col("pn") * F.col("len")).cast("long").alias("prev_bytes"),
        F.sum(F.col("cn") * F.col("len")).cast("long").alias("curr_bytes"),
        F.sum(F.least(F.col("pn"), F.col("cn")) * F.col("len"))
        .cast("long")
        .alias("shared_bytes"),
    )
    bigger = F.greatest(F.col("prev_bytes"), F.col("curr_bytes"))
    return per.select(
        F.col("_id").alias(id_col),
        "prev_bytes",
        "curr_bytes",
        "shared_bytes",
        F.round(
            F.when(bigger > 0, 1.0 - F.col("shared_bytes") / bigger).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("changed_frac_r"),
    )


def fixed_capture_delta(
    prev: DataFrame,
    curr: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 64,
) -> DataFrame:
    """Fixed-size sibling of ``capture_delta_stats`` over TEXT captures —
    pure Catalyst, engine-portable md5 chunk hashes, same output shape
    (chars instead of bytes). Exists as the oracle anchor for the
    multiset-compare arithmetic; CDC's shift robustness is what makes the
    real operator report small deltas for small edits."""
    if chunk_chars < 1:
        raise ValueError("chunk_chars must be >= 1")

    def census(df: DataFrame) -> DataFrame:
        t = F.coalesce(F.col(text_col), F.lit(""))
        idx = F.explode(
            F.sequence(
                F.lit(0), F.ceil(F.length(t) / chunk_chars).cast("int") - 1
            )
        ).alias("i")
        return (
            df.where(F.length(t) > 0)
            .select(F.col(id_col).alias("_id"), t.alias("t"), idx)
            .select(
                "_id",
                F.md5(
                    F.substring(F.col("t"), F.col("i") * chunk_chars + 1, chunk_chars)
                ).alias("chunk_hash"),
                F.length(
                    F.substring(F.col("t"), F.col("i") * chunk_chars + 1, chunk_chars)
                ).cast("long").alias("len"),
            )
            .groupBy("_id", "chunk_hash")
            .agg(F.count(F.lit(1)).alias("n"), F.min("len").alias("len"))
        )

    p = census(prev).select(
        "_id", "chunk_hash", F.col("n").alias("pn"), F.col("len").alias("plen")
    )
    c = census(curr).select(
        "_id", "chunk_hash", F.col("n").alias("cn"), F.col("len").alias("clen")
    )
    j = p.join(c, ["_id", "chunk_hash"], "full_outer").select(
        "_id",
        F.coalesce(F.col("pn"), F.lit(0)).alias("pn"),
        F.coalesce(F.col("cn"), F.lit(0)).alias("cn"),
        F.coalesce(F.col("plen"), F.col("clen")).alias("len"),
    )
    per = j.groupBy("_id").agg(
        F.sum(F.col("pn") * F.col("len")).cast("long").alias("prev_chars"),
        F.sum(F.col("cn") * F.col("len")).cast("long").alias("curr_chars"),
        F.sum(F.least(F.col("pn"), F.col("cn")) * F.col("len"))
        .cast("long")
        .alias("shared_chars"),
    )
    bigger = F.greatest(F.col("prev_chars"), F.col("curr_chars"))
    return per.select(
        F.col("_id").alias(id_col),
        "prev_chars",
        "curr_chars",
        "shared_chars",
        F.round(
            F.when(bigger > 0, 1.0 - F.col("shared_chars") / bigger).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("changed_frac_r"),
    )


def fixed_chunk_stats(
    df: DataFrame,
    text_col: str = "text",
    chunk_chars: int = 64,
) -> DataFrame:
    """Fixed-size chunking baseline over a TEXT column, pure Catalyst —
    the oracle-anchored sibling (md5 over character substrings restates in
    DuckDB verbatim) and the contrast case for CDC's shift robustness:
    one inserted byte re-hashes every following fixed chunk. Same output
    shape as chunk_dedup_stats."""
    if chunk_chars < 1:
        raise ValueError("chunk_chars must be >= 1")
    t = F.coalesce(F.col(text_col), F.lit(""))
    idx = F.explode(
        F.sequence(F.lit(0), F.ceil(F.length(t) / chunk_chars).cast("int") - 1)
    ).alias("i")
    chunks = (
        df.where(F.length(t) > 0)
        .select(t.alias("t"), idx)
        .select(
            F.md5(F.substring(F.col("t"), F.col("i") * chunk_chars + 1, chunk_chars))
            .alias("chunk_hash"),
            F.length(
                F.substring(F.col("t"), F.col("i") * chunk_chars + 1, chunk_chars)
            ).cast("long").alias("length"),
        )
    )
    per_hash = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("copies"), F.min("length").alias("length")
    )
    return per_hash.agg(
        F.sum("copies").cast("long").alias("total_chunks"),
        F.count(F.lit(1)).cast("long").alias("distinct_chunks"),
        F.sum(F.col("copies") * F.col("length")).cast("long").alias("total_chars"),
        F.sum("length").cast("long").alias("distinct_chars"),
        F.round(
            F.sum("length")
            / F.when(
                F.sum(F.col("copies") * F.col("length")) > 0,
                F.sum(F.col("copies") * F.col("length")),
            ),
            6,
        ).alias("dedup_ratio_r"),
    )
