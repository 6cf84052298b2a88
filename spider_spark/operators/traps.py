"""Spider-trap guards for the URL frontier.

A web-scale crawler meets URL spaces that are infinite by construction:
calendar pages (`/cal/2024/05/31` → every date that ever existed),
session-id pagination, and path-loop misconfigurations
(`/a/b/a/b/a/b/...`). The reference library crawls single pages on
demand and never meets these; a 10^10-URL frontier drowns in them, so
the guard is a first-class frontier stage here (the same role Heritrix's
`PathologicalPathDecideRule` / `TooManyPathSegmentsDecideRule` play).

Everything is pure Catalyst — the structural predicates are regex/array
expressions (whole-stage codegen, scan speed), and the per-pattern cap
reuses the two-phase salted top-k discipline of
`frontier.politeness_tag`, so one trap pattern emitting 10^8 URLs per
tick can never serialize a window task.

Reasons, first-match-wins (the §2.6 detector-chain pattern):

- ``too_long``            — URL longer than ``max_url_len``
- ``too_many_segments``   — path deeper than ``max_path_depth``
- ``too_many_params``     — more than ``max_query_params`` query params
- ``repeated_segment``    — some path segment occurs ≥ ``max_segment_repeat``
                            times (the /a/b/a/b/a/b loop)
- ``pattern_cap``         — URL is clean but its (host, url_pattern)
                            group already holds ``max_per_pattern``
                            earlier URLs this batch; url_pattern is the
                            path with digit runs collapsed, so every
                            calendar/pagination family is one group

Host/path/query extraction is done with explicit regexes (not
``parse_url``) so the operator is engine-portable and DuckDB-oracle
checkable; inputs are canonical URLs (urlops), which these regexes
handle exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "col_url_host",
    "col_url_path",
    "col_query_param_count",
    "col_url_pattern",
    "trap_tag",
    "trap_filter",
]


def col_url_host(url_col: str | Column) -> Column:
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)


def col_url_path(url_col: str | Column) -> Column:
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)


def col_query_param_count(url_col: str | Column) -> Column:
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    q = F.regexp_extract(c, r"\?([^#]*)", 1)
    return F.when(q == "", F.lit(0)).otherwise(
        F.size(F.filter(F.split(q, "&"), lambda p: p != F.lit("")))
    )


def col_url_pattern(url_col: str | Column) -> Column:
    """Trap-family key: host + path with long hex runs → 'H' and digit
    runs → 'N' (hex first, else '2024' becomes 'N' before a 32-char id
    can match). `/cal/2024/05/31` and `/cal/2019/12/01` share the
    pattern `host/cal/N/N/N`; an unbounded family becomes one group."""
    path = col_url_path(url_col)
    norm = F.regexp_replace(path, r"[0-9a-fA-F]{8,}", "H")
    norm = F.regexp_replace(norm, r"[0-9]+", "N")
    return F.concat(col_url_host(url_col), norm)


def _col_path_segments(url_col: str | Column) -> Column:
    return F.filter(
        F.split(col_url_path(url_col), "/"), lambda s: s != F.lit("")
    )


def trap_tag(
    df: DataFrame,
    url_col: str = "url_canon",
    seq_col: str = "seq",
    max_url_len: int = 2048,
    max_path_depth: int = 16,
    max_query_params: int = 8,
    max_segment_repeat: int = 3,
    max_per_pattern: int | None = None,
    pattern_salt: int = 16,
) -> DataFrame:
    """Add ``url_pattern`` and ``trap_reason`` (null = clean) columns.

    The structural reasons are map-only. The per-pattern cap (when
    ``max_per_pattern`` is set) ranks clean rows by ``seq_col`` (the
    data-derived encounter order, so the survivors are deterministic
    under any parallelism) within (url_pattern) in two phases: phase 1
    keeps ≤k per (pattern, salt) bucket — bounding any single task even
    when one trap family floods the batch — and phase 2 ranks the
    ≤k·salt survivors exactly. Rows beyond the cap get reason
    ``pattern_cap``.
    """
    c = F.col(url_col)
    segs = _col_path_segments(url_col)
    repeated = F.exists(
        F.array_distinct(segs),
        lambda s: F.size(F.filter(segs, lambda x: x == s))
        >= F.lit(max_segment_repeat),
    )
    structural = (
        F.when(F.length(c) > max_url_len, F.lit("too_long"))
        .when(F.size(segs) > max_path_depth, F.lit("too_many_segments"))
        .when(
            col_query_param_count(url_col) > max_query_params,
            F.lit("too_many_params"),
        )
        .when(repeated, F.lit("repeated_segment"))
    )
    out = df.withColumn("url_pattern", col_url_pattern(url_col)).withColumn(
        "trap_reason", structural
    )
    if max_per_pattern is None:
        return out

    clean = out.filter(F.col("trap_reason").isNull())
    dirty = out.filter(F.col("trap_reason").isNotNull())
    salted = clean.withColumn(
        "_tsalt", F.pmod(F.xxhash64(F.col(url_col)), F.lit(pattern_salt))
    )
    w1 = Window.partitionBy("url_pattern", "_tsalt").orderBy(seq_col)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= max_per_pattern)
        .drop("_r1", "_tsalt")
    )
    # rows cut in phase 1 are beyond the cap by construction (their salt
    # bucket alone already held k earlier rows)
    overflow1 = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") > max_per_pattern)
        .drop("_r1", "_tsalt")
        .withColumn("trap_reason", F.lit("pattern_cap"))
    )
    w2 = Window.partitionBy("url_pattern").orderBy(seq_col)
    ranked = survivors.withColumn("_r2", F.row_number().over(w2))
    kept = ranked.filter(F.col("_r2") <= max_per_pattern).drop("_r2")
    overflow2 = (
        ranked.filter(F.col("_r2") > max_per_pattern)
        .drop("_r2")
        .withColumn("trap_reason", F.lit("pattern_cap"))
    )
    return kept.unionByName(overflow2).unionByName(overflow1).unionByName(dirty)


def trap_filter(
    df: DataFrame,
    url_col: str = "url_canon",
    seq_col: str = "seq",
    **kwargs,
) -> DataFrame:
    """Keep only clean rows (trap_tag then drop the tagged columns) —
    the form the crawl loop consumes. Trapped rows are simply not
    enqueued; the crawl ledger stays append-only and resume-safe because
    the filter is deterministic in the row data."""
    tagged = trap_tag(df, url_col=url_col, seq_col=seq_col, **kwargs)
    return tagged.filter(F.col("trap_reason").isNull()).drop(
        "url_pattern", "trap_reason"
    )
