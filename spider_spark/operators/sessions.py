"""Sessionization over event/weblog streams (beyond reference: the
classic web-analytics operator next to the crawl — the same events table
a crawler's fetch ledger feeds becomes user sessions for traffic
analysis, bot screening, and training-data rate features).

Batch form: the textbook gap-based sessionizer — a session breaks when
the same user's inter-event gap exceeds ``gap_s`` (industry default 30
min). ONE user-keyed window pays for everything (lag → break flag →
running sum = session ordinal); the per-session rollup is then a plain
partial-agg groupBy. The window key is the user id: cardinality ≈ users,
so parallelism is wide by construction; a single pathological key (a
bot with 10^8 events) is the upstream rate-limiter's job — the same
assumption every sessionizer in production makes, and the skew case AQE
splits at execution time.

Streaming form: ``spider_spark.streaming.stream_session_stats`` maps the
identical semantics onto Structured Streaming's ``session_window`` with
a watermark (state is evicted once the watermark passes a session's
close — bounded memory at any runtime length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_S = 1800  # the conventional 30-minute web-session timeout


def _epoch_s(ts_col: str):
    """Second-truncated epoch — via an intermediate cast to TIMESTAMP so
    TIMESTAMP_NTZ inputs work too (NTZ → long is not castable directly);
    only DIFFERENCES are consumed, so the session-timezone offset the NTZ
    cast introduces cancels."""
    return F.col(ts_col).cast("timestamp").cast("long")


def sessionize(
    events: DataFrame,
    gap_s: int = DEFAULT_GAP_S,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Tag every event with its session ordinal: ``session_seq`` starts
    at 0 per user and increments whenever the gap since the user's
    previous event exceeds ``gap_s``. Ties on ``ts`` are ordered by the
    full (ts, event ordinal) frame only if present — the window orders
    by ``ts_col`` alone, so equal-timestamp events share a session by
    construction (a tie can never open one). Returns the input columns
    plus ``session_seq``."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = _epoch_s(ts_col) - F.lag(_epoch_s(ts_col)).over(w)
    is_break = F.when(gap.isNull() | (gap <= gap_s), F.lit(0)).otherwise(F.lit(1))
    return events.withColumn(
        "session_seq",
        F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )


def session_stats(
    events: DataFrame,
    gap_s: int = DEFAULT_GAP_S,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup over ``sessionize``: (user, session_seq,
    session_start, session_end, n_events, duration_s). One window + one
    partial-agg groupBy — the whole job is a single user-keyed shuffle
    (the groupBy key extends the window key, so no second exchange)."""
    tagged = sessionize(events, gap_s, user_col, ts_col)
    return tagged.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(_epoch_s(ts_col)) - F.min(_epoch_s(ts_col)))
        .cast("long")
        .alias("duration_s"),
    )
