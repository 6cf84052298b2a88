"""Adaptive recrawl scheduling: estimate per-URL change rates from the
capture history and derive refresh intervals / frontier priorities.

The crawler already supports *mechanical* recrawl (Crawler.requeue_urls /
forget_urls). This module supplies the *policy*: how often a URL is worth
refetching, learned from how often its content actually changed across
past captures — the Cho & Garcia-Molina estimator ("Estimating Frequency
of Change", ACM TOIT 2003): with n observed intervals of mean length Δ̄
and X of them showing a change, the Poisson change rate is

    λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / Δ̄

(the +0.5 continuity correction keeps λ̂ finite when every interval
changed). The suggested refresh interval is 1/λ̂, clamped to policy
bounds.

Scale shape: one shuffle on url (window lag to detect changes between
consecutive captures), then a partial-aggregable groupBy on the same key —
with AQE the exchange is reused, so the whole estimator is ~one pass over
the capture log. Everything is codegen (lag / unix_timestamp / ln); no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["change_rate", "recrawl_intervals"]


def change_rate(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    fp_col: str = "fp",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-URL change-rate estimate from a capture log
    (url, capture timestamp, content fingerprint).

    Output: (url_col, n_captures, n_changes, lambda_per_s) where
    lambda_per_s is the Cho–Garcia-Molina Poisson rate (null when fewer
    than 2 captures — no interval evidence)."""
    order = [F.col(ts_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(url_col).orderBy(*order)
    # exact integer microseconds: interval sums are order-independent
    # (< 2^53), so the mean — and every float op downstream — is
    # bit-reproducible across engines/partitionings. NTZ timestamps use
    # calendar arithmetic (timestampdiff) — tz-free, so the result never
    # depends on the session timezone.
    from pyspark.sql.types import TimestampNTZType

    if isinstance(captures.schema[ts_col].dataType, TimestampNTZType):
        ts_us = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `{ts_col}`)"
        )
    else:
        ts_us = F.unix_micros(F.col(ts_col))
    lagged = captures.select(
        F.col(url_col),
        ts_us.alias("_ts_us"),
        F.col(fp_col).alias("_fp"),
        F.lag(ts_us).over(w).alias("_prev_ts"),
        F.lag(F.col(fp_col)).over(w).alias("_prev_fp"),
    )
    per_url = lagged.groupBy(url_col).agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.sum(
            F.when(
                F.col("_prev_fp").isNotNull() & (F.col("_fp") != F.col("_prev_fp")), 1
            ).otherwise(0)
        ).alias("n_changes"),
        F.count("_prev_ts").alias("_n_intervals"),
        (F.avg((F.col("_ts_us") - F.col("_prev_ts")).cast("double")) / F.lit(1e6)).alias(
            "_mean_dt"
        ),
    )
    n = F.col("_n_intervals").cast("double")
    x = F.col("n_changes").cast("double")
    # + 0.0 normalizes the X=0 case's IEEE -0.0 to +0.0 (stable display/hash)
    lam = F.when(
        (F.col("_n_intervals") > 0) & (F.col("_mean_dt") > 0),
        -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))) / F.col("_mean_dt") + F.lit(0.0),
    )
    return per_url.select(
        url_col, "n_captures", "n_changes", lam.alias("lambda_per_s")
    )


def recrawl_intervals(
    rates: DataFrame,
    min_interval_s: int = 3600,
    max_interval_s: int = 30 * 24 * 3600,
    lambda_col: str = "lambda_per_s",
) -> DataFrame:
    """Suggested refresh interval per URL: 1/λ̂ clamped to policy bounds;
    URLs with no rate evidence (λ null or 0) get the maximum interval.
    Adds interval_s (double, clamped). Compose with CrawlConfig's
    priority expression: shorter interval → higher refresh priority."""
    lam = F.col(lambda_col)
    raw = F.when(lam > 0, F.lit(1.0) / lam).otherwise(F.lit(float(max_interval_s)))
    clamped = F.least(
        F.greatest(raw, F.lit(float(min_interval_s))), F.lit(float(max_interval_s))
    )
    return rates.withColumn("interval_s", clamped)
