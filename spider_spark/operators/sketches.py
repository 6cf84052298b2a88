"""Frequent-item sketches over unbounded key streams: Misra-Gries heavy
hitters and the Count-Min Sketch.

At 10^10-URL crawl scale, "which hosts dominate the frontier" / "which
URL patterns are exploding this tick" cannot be answered with a plain
groupBy-count: the distinct-key set itself is the thing that doesn't fit
(the reference keeps per-host tallies in an in-process Map —
spider.ts metrics — which caps it at one machine's memory). Two classic
MERGEABLE summaries replace it with bounded state:

- **Misra-Gries heavy hitters** (Misra & Gries 1982; mergeable form per
  Agarwal et al. 2012, "Mergeable Summaries"): each partition maintains
  at most ``k`` counters; any key with global count > n/(k+1) is
  GUARANTEED to survive in at least one partition's summary (if it
  exceeded n_p/(k+1) nowhere, summing those bounds gives count ≤ n/(k+1),
  a contradiction). The union of the per-partition summaries is therefore
  a superset of the true heavy hitters; an EXACT recount of that bounded
  candidate set makes the final answer exact — the approximation affects
  only candidate recall head-room, never the emitted rows. Two scans of
  the input, shuffle bounded by k × partitions candidate keys.

- **Count-Min Sketch** (Cormode & Muthukrishnan 2005): a depth×width
  counter matrix; point estimate = min over depth rows of the hashed
  counter. Counters here use the repo's engine-portable md5 bucket hash
  (curation.col_hash_bucket discipline) so a DuckDB oracle reproduces
  every counter bit-for-bit. Estimates never undercount; overcount is
  bounded by ~2n/width per row with high probability. The sketch is a
  DataFrame of at most depth×width rows — merge two sketches by summing
  matching counters (``cms_merge``), the property that makes it a
  per-tick crawl telemetry structure (accumulate across ticks without
  re-scanning history).

Scale shape (100 TB): the MG stage is one mapInPandas pass with O(k)
state per partition (value_counts per Arrow batch, then an MG-merge
decrement — no per-row Python); the recount is a broadcast semi-join +
partial-agg count. The CMS build explodes depth rows per input row but
partial-aggregates to ≤ depth×width before the exchange, so the shuffle
is constant-size regardless of input. No windows, no collect.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "col_cms_bucket",
    "count_min_sketch",
    "cms_merge",
    "cms_estimate",
    "mg_candidates",
    "heavy_hitters",
]


def col_cms_bucket(key: Column, row: int, width: int) -> Column:
    """Engine-portable CMS bucket for hash row ``row``: first 8 hex chars
    of md5("<row>:<key>") → int → mod width. Same md5 trick as
    curation.col_hash_bucket so DuckDB restates it exactly
    (('0x' || substr(md5(r || ':' || key), 1, 8))::UBIGINT % width)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), key)), 1, 8), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(width)).cast("int")


def _rb_structs(key: Column, depth: int, width: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("hrow"),
                col_cms_bucket(key, i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a CMS over ``key_col`` (null keys skipped): one row per
    non-empty counter, (hrow, bucket, cnt). ``weight_col`` counts each
    input row that many times (e.g. bytes fetched per URL). The explode
    is depth rows/input row but partial aggregation collapses each task
    to ≤ depth×width rows before the exchange — constant shuffle."""
    key = F.col(key_col).cast("string")
    keyed = df.where(key.isNotNull()).select(
        key.alias("key"),
        (F.col(weight_col) if weight_col else F.lit(1)).cast("long").alias("w"),
    )
    pairs = keyed.select(
        F.explode(_rb_structs(F.col("key"), depth, width)).alias("rb"), "w"
    )
    return pairs.groupBy(
        F.col("rb.hrow").alias("hrow"), F.col("rb.bucket").alias("bucket")
    ).agg(F.sum("w").alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the SAME (depth, width): sum matching
    counters. CMS(x ∪ y) ≡ cms_merge(CMS(x), CMS(y)) exactly — the
    mergeable-summary property (tested)."""
    return (
        a.unionByName(b)
        .groupBy("hrow", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate counts for ``keys`` (distinct non-null values of
    ``key_col``): est = min over the depth hashed counters (absent
    counter = 0). Returns (key, est_cnt); est_cnt ≥ true count always.
    The sketch side is ≤ depth×width rows — broadcast unconditionally."""
    key = F.col(key_col).cast("string")
    probe = (
        keys.where(key.isNotNull())
        .select(key.alias("key"))
        .distinct()
        .select("key", F.explode(_rb_structs(F.col("key"), depth, width)).alias("rb"))
        .select("key", F.col("rb.hrow").alias("hrow"), F.col("rb.bucket").alias("bucket"))
    )
    joined = probe.join(F.broadcast(sketch), ["hrow", "bucket"], "left")
    return joined.groupBy("key").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt")
    )


def _mg_factory(k: int):
    """mapInPandas partition function: a k-counter Misra-Gries summary
    accumulated across Arrow batches. Each batch contributes its EXACT
    value_counts (a zero-error MG summary of the batch), merged into the
    accumulator by the Agarwal et al. 2012 rule: add counts; if more than
    k keys survive, subtract the (k+1)-st largest count from every key
    and drop the non-positive. State is O(k) keys regardless of
    partition size; the loop is over summary keys, never input rows.

    Emits (key, cnt) candidate rows plus ONE (key=NULL, cnt=n_p) row
    carrying the partition's row count so callers get n without a second
    aggregate over the input."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        total = 0
        for pdf in batches:
            col = pdf.iloc[:, 0].dropna()
            total += int(len(col))
            if len(col) == 0:
                continue
            for key, c in col.value_counts().items():
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > k:
                kth = sorted(counts.values(), reverse=True)[k]
                counts = {key: c - kth for key, c in counts.items() if c > kth}
        out = pd.DataFrame(
            {
                "key": list(counts.keys()) + [None],
                "cnt": list(counts.values()) + [total],
            }
        )
        yield out

    return run


def mg_candidates(df: DataFrame, key_col: str = "key", k: int = 100) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned: (key, cnt) candidate
    rows (cnt is the residual MG counter, a LOWER bound on the partition
    count — diagnostic only) plus one null-key row per partition whose
    cnt is that partition's non-null row count."""
    keyed = df.select(F.col(key_col).cast("string").alias("key"))
    return keyed.mapInPandas(_mg_factory(k), schema="key string, cnt long")


def heavy_hitters(
    df: DataFrame,
    key_col: str = "key",
    k: int = 100,
    min_frac: float | None = None,
) -> DataFrame:
    """EXACT φ-heavy hitters with bounded intermediate state: keys whose
    count strictly exceeds n/(k+1) (or ``min_frac``·n when given;
    min_frac must be ≥ 1/(k+1) for the MG recall guarantee to cover it).
    Two scans of ``df``: the MG candidate pass and an exact recount of
    the ≤ k×partitions candidates (broadcast semi-join). Returns
    (key, cnt, frac_r) — frac rounded to 6 places, deterministic."""
    if min_frac is not None and min_frac * (k + 1) < 1.0:
        raise ValueError(
            f"min_frac={min_frac} below the 1/(k+1)={1.0 / (k + 1):.6f} "
            "recall guarantee of k MG counters; raise k or min_frac"
        )
    summary = mg_candidates(df, key_col, k).persist()
    try:
        n = (
            summary.where(F.col("key").isNull())
            .agg(F.sum("cnt").alias("n"))
            .first()["n"]
        ) or 0
        # materialize the bounded candidate set (≤ k × partitions rows) and
        # cut lineage so the returned lazy plan no longer references the
        # persisted summary — unpersisting below can't force a third scan
        cand = (
            summary.where(F.col("key").isNotNull())
            .select("key")
            .distinct()
            .localCheckpoint()
        )
        keyed = df.select(F.col(key_col).cast("string").alias("key")).where(
            F.col("key").isNotNull()
        )
        exact = (
            keyed.join(F.broadcast(cand), "key", "left_semi")
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        if min_frac is None:
            survived = exact.where(F.col("cnt") * (k + 1) > F.lit(int(n)))
        else:
            survived = exact.where(
                F.col("cnt").cast("double") > F.lit(float(min_frac) * n)
            )
        return survived.select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.lit(float(n) if n else 1.0), 6).alias("frac_r"),
        )
    finally:
        summary.unpersist(blocking=False)
