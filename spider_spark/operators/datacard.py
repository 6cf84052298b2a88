"""Corpus data-card rollup — the release-notes statistics table every
published training corpus ships (per-source / per-language doc, token
and char counts with length-band breakdowns; The Pile / Dolma / C4
papers each publish exactly this table).

One pass, one shuffle: ``rollup(source, lang)`` computes the
(source, lang), (source) and grand-total grouping sets together —
Catalyst's Expand replicates rows per grouping set BEFORE the exchange
and partial aggregation collapses them map-side, so the shuffle carries
one partial row per (grouping set × group × partition), never the
corpus. At 100 TB the data card costs one scan regardless of how many
rollup levels it reports.

All emitted statistics are exact integer/mean aggregates (no
percentile_approx) so the DuckDB oracle replays the rollup bit-for-bit
— ``grouping_id()`` and DuckDB's ``GROUPING(a, b)`` share the standard
SQL bit encoding (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import textqc

#: Length-band edges (whitespace tokens): docs shorter than SHORT_TOKENS
#: are "short" (C4 drops sub-~32-token pages), longer than LONG_TOKENS
#: are "long" (context-window outliers a packing stage must split).
SHORT_TOKENS = 32
LONG_TOKENS = 1024

#: Sentinel for rolled-up grouping columns — kept a plain string so the
#: card is readable and engine-portable (NULL-vs-NaN pandas ambiguity
#: never reaches the comparator).
ALL = "<all>"


def _band(n_tokens: Column) -> tuple[Column, Column]:
    short = (n_tokens < SHORT_TOKENS).cast("long")
    long_ = (n_tokens > LONG_TOKENS).cast("long")
    return short, long_


def corpus_datacard(
    docs: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """The data card: one row per (source, lang), per source, and the
    grand total (``level`` = standard grouping_id bits: 0 exact group,
    1 lang rolled up, 3 grand total).

    Columns: n_docs, n_tokens (whitespace), n_chars, mean_tokens_r
    (rounded 4), max_tokens, short_docs (< SHORT_TOKENS), long_docs
    (> LONG_TOKENS). All exact — reproducible on any engine.
    """
    n_tokens = textqc.col_token_count(text_col)
    short, long_ = _band(F.col("n_tokens"))
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        n_tokens.alias("n_tokens"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("n_chars"),
    )
    return (
        base.rollup("source", "lang")
        .agg(
            F.grouping_id().alias("level"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
            F.round(F.avg("n_tokens"), 4).alias("mean_tokens_r"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum(short).alias("short_docs"),
            F.sum(long_).alias("long_docs"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit(ALL)).alias("source"),
            F.coalesce(F.col("lang"), F.lit(ALL)).alias("lang"),
            "level",
            "n_docs",
            "n_tokens",
            "n_chars",
            "mean_tokens_r",
            "max_tokens",
            "short_docs",
            "long_docs",
        )
    )
