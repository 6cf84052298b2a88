"""Windowed term-frequency trends — burst detection over a crawl stream
(the "what is the web talking about this hour" rollup; Kleinberg-style
burst detection reduced to its deterministic core: tumbling-window counts
plus adjacent-window lift).

Shapes, 100 TB first:

- **window counts**: tokenize → explode → one partial-agg shuffle keyed
  on (window, term) — the same bytes the postings build pays, bounded by
  distinct (window, term), not token occurrences.
- **lift**: a lag window partitioned by TERM ordered by window start.
  Rows per term = number of windows in the time range (a few thousand
  for a year of hourly windows) — no hot-key risk at any corpus size,
  in deliberate contrast to per-host windows (salted two-phase there).
- Lift is only defined against the IMMEDIATELY preceding window
  (window_start delta == exactly the window width); a term that skipped
  a window restarts cold (lift null) — otherwise a term absent for a
  month would compute lift vs stale history, and the result would
  depend on how far back the data happens to reach.

All timestamps reduce to epoch seconds of the tumbling-window start
(engine-portable; Spark ``F.window`` and DuckDB ``time_bucket`` are both
epoch-aligned). Counts are exact — this is the ground-truth rollup a
sketch would approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .index import col_index_tokens


def term_window_counts(
    df: DataFrame,
    ts_col: str = "warc_ts",
    window_minutes: int = 60,
    term_col: str | None = None,
    text_col: str | None = "text",
) -> DataFrame:
    """Tumbling-window term counts: (window_start_epoch, term, n).

    Two input modes: ``term_col`` names a pre-tokenized term column
    (e.g. event_type, a detected language, a hashtag column); otherwise
    ``text_col`` is tokenized with the index tokenizer and every token
    occurrence counts. Window starts are epoch-aligned."""
    if window_minutes < 1:
        raise ValueError("window_minutes must be >= 1")
    if term_col is not None:
        terms = df.select(
            F.col(ts_col).alias("_ts"), F.col(term_col).alias("term")
        )
    else:
        terms = df.select(
            F.col(ts_col).alias("_ts"),
            F.explode(col_index_tokens(text_col)).alias("term"),
        )
    win = F.window("_ts", f"{window_minutes} minutes")
    return (
        terms.groupBy(win.alias("_w"), "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("_w.start")).alias("window_start_epoch"),
            "term",
            "n",
        )
    )


def trending_terms(
    df: DataFrame,
    ts_col: str = "warc_ts",
    window_minutes: int = 60,
    term_col: str | None = None,
    text_col: str | None = "text",
    min_count: int = 1,
) -> DataFrame:
    """Adjacent-window lift per term: (window_start_epoch, term, n,
    prev_n, lift_r). ``prev_n``/``lift_r`` are null when the term was
    absent from the immediately preceding window (cold start or gap —
    see module docstring). ``min_count`` filters the OUTPUT rows only,
    after lift is computed, so a small current window still sees its
    large predecessor."""
    counts = term_window_counts(
        df, ts_col, window_minutes, term_col=term_col, text_col=text_col
    )
    w = Window.partitionBy("term").orderBy("window_start_epoch")
    prev_n = F.lag("n").over(w)
    prev_ws = F.lag("window_start_epoch").over(w)
    adjacent = prev_ws == F.col("window_start_epoch") - window_minutes * 60
    return (
        counts.withColumn("prev_n", F.when(adjacent, prev_n))
        .withColumn(
            "lift_r",
            F.when(
                F.col("prev_n").isNotNull(),
                F.round(F.col("n") / F.col("prev_n"), 6),
            ),
        )
        .where(F.col("n") >= min_count)
    )
