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

__all__ = [
    "change_rate",
    "recrawl_intervals",
    "col_http_date",
    "http_freshness",
    "retry_backoff_plan",
]


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


def _ts_us(df: DataFrame, ts_col: str):
    """Exact integer microseconds for a timestamp column, NTZ-safe (the
    change_rate discipline: calendar arithmetic, never session-tz)."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `{ts_col}`)"
        )
    return F.unix_micros(F.col(ts_col))


def expected_freshness(
    rates: DataFrame,
    as_of,
    url_col: str = "url",
    last_ts_col: str = "last_ts",
    lambda_col: str = "lambda_per_s",
) -> DataFrame:
    """Expected freshness per URL under the Poisson change model (Cho &
    Garcia-Molina 2003, "Effective Page Refresh Policies"): the local
    copy captured at ``last_ts`` is still fresh at ``as_of`` with
    probability F = e^(−λ·age). Input: one row per URL with the
    change-rate estimate (``change_rate`` output joined to the latest
    capture — the latest_capture snapshot at engine scale) and the
    caller-pinned evaluation instant (a literal, so the result is
    deterministic and oracle-checkable — never "now()").

    Output adds age_s (exact integer-µs age, float seconds) and
    freshness_r (rounded 6); λ null → freshness null (no interval
    evidence — unknown, not fresh). Pure projection, no shuffle."""
    import datetime as _dt

    if as_of.tzinfo is None:
        # naive ⇒ UTC wall time, NEVER the host tz (datetime.timestamp()
        # on a naive value would silently localize)
        as_of_us = int(
            (as_of - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
        )
    else:
        as_of_us = int(as_of.timestamp() * 1_000_000)
    age_s = (
        (F.lit(as_of_us) - _ts_us(rates, last_ts_col)).cast("double") / F.lit(1e6)
    )
    lam = F.col(lambda_col)
    return rates.select(
        url_col,
        lambda_col,
        F.round(age_s, 6).alias("age_s"),
        F.round(
            F.when(lam.isNotNull() & (age_s >= 0), F.exp(-lam * age_s)),
            6,
        ).alias("freshness_r"),
    )


def freshness_rollup(fresh: DataFrame, stale_below: float = 0.5) -> DataFrame:
    """Corpus freshness ledger: one row — URLs scored / unscored, mean
    and min expected freshness over scored URLs, and how many sit below
    the staleness threshold (the recrawl backlog). One partial agg."""
    f = F.col("freshness_r")
    return fresh.agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.count(f).cast("long").alias("n_scored"),
        F.round(F.avg(f), 6).alias("avg_freshness_r"),
        F.round(F.min(f), 6).alias("min_freshness_r"),
        F.sum(F.when(f < stale_below, 1).otherwise(0))
        .cast("long")
        .alias("n_stale"),
    )


def revisit_priority(
    fresh: DataFrame,
    ranks: DataFrame | None = None,
    url_col: str = "url",
    rank_col: str = "rank",
    freshness_col: str = "freshness_r",
) -> DataFrame:
    """Revisit-value ordering — the greedy step of the importance-
    weighted freshness objective (Cho & Garcia-Molina 2003 §6: maximize
    Σ importance·freshness): refetch the pages that are BOTH important
    and likely stale,

        revisit = rank · (1 − expected_freshness).

    Unknown freshness (null λ̂ — no interval evidence yet) counts as
    fully stale, so new pages are never starved of the evidence that
    would earn them a schedule; URLs absent from the rank table take
    rank 1 (the PageRank teleport floor, `graph.pagerank`'s convention).
    One url-keyed left join + a projection; composes
    ``expected_freshness`` ∘ ``graph.pagerank`` and feeds
    `Crawler.requeue_urls`. Returns (url, rank, staleness_r,
    revisit_r)."""
    f = fresh.select(
        F.col(url_col),
        (
            F.lit(1.0) - F.coalesce(F.col(freshness_col), F.lit(0.0))
        ).alias("_stale"),
    )
    if ranks is not None:
        f = f.join(
            ranks.select(
                F.col(url_col), F.col(rank_col).cast("double").alias("_rank")
            ),
            url_col,
            "left",
        )
    else:
        f = f.withColumn("_rank", F.lit(None).cast("double"))
    rank = F.coalesce(F.col("_rank"), F.lit(1.0))
    return f.select(
        url_col,
        F.round(rank, 6).alias("rank"),
        F.round(F.col("_stale"), 6).alias("staleness_r"),
        F.round(rank * F.col("_stale"), 6).alias("revisit_r"),
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


# --- Server-declared freshness (RFC 9111 §4.2): the other recrawl signal ----
# change_rate learns how often content ACTUALLY changes; HTTP caching
# headers say how long the ORIGIN promises the response stays fresh. A
# polite crawler honors the stronger of the two (don't refetch inside the
# declared lifetime; revalidate with the stored validators via
# fetch.live_fetch(etag_col=..., last_modified_col=...) once it lapses).

#: IMF-fixdate (RFC 9110 §5.6.7, 'Sun, 06 Nov 1994 08:49:37 GMT') — the
#: optional day name is stripped first (Spark's parser bans the day-name
#: token), zone names parse under zzz and numeric offsets under Z, same
#: discipline as feeds._RFC822_*.
_HTTPDATE_ZONE = "dd MMM yyyy HH:mm:ss zzz"
_HTTPDATE_OFFSET = "dd MMM yyyy HH:mm:ss Z"
_HTTPDATE_DAY_PREFIX = r"^\s*[A-Za-z]{3},\s*"


def col_http_date(raw: Column) -> Column:
    """Lenient IMF-fixdate → timestamp; unparseable → NULL (try_to_timestamp
    throughout — a garbage Date header must never abort a 100 TB scan)."""
    no_day = F.regexp_replace(F.trim(raw), _HTTPDATE_DAY_PREFIX, "")
    return F.coalesce(
        F.try_to_timestamp(no_day, F.lit(_HTTPDATE_ZONE)),
        F.try_to_timestamp(no_day, F.lit(_HTTPDATE_OFFSET)),
    )


def _cc_directive(cc: Column, name: str) -> Column:
    """True iff the Cache-Control value contains `name` as its own
    directive token (case-insensitive, comma list, never a substring of a
    longer token — 'no-cache' must not fire on 'stale-while-revalidate'
    and 'max-age' must not fire on 's-maxage')."""
    return cc.rlike(rf"(?i)(?:^|[\s,]){name}(?:$|[\s,=;])")


def _cc_seconds(cc: Column, name: str) -> Column:
    """Integer argument of a `name=N` directive (optionally quoted), NULL
    when absent/malformed."""
    got = F.regexp_extract(cc, rf'(?i)(?:^|[\s,]){name}\s*=\s*"?(\d+)', 1)
    return F.nullif(got, F.lit("")).cast("long")


def http_freshness(
    responses: DataFrame,
    shared: bool = True,
    heuristic_fraction: float = 0.1,
    heuristic_cap_s: int = 7 * 24 * 3600,
    cc_col: str = "cache_control",
    expires_col: str = "expires",
    date_col: str = "http_date",
    last_modified_col: str = "last_modified",
) -> DataFrame:
    """Freshness lifetime per response from its caching headers — RFC 9111
    §4.2.1 precedence, appended as ``(freshness_s BIGINT, freshness_source
    STRING)``:

    1. ``no-store`` / ``no-cache`` → 0 (always revalidate; a crawler
       treats qualified no-cache="field" the same — conservative).
    2. ``s-maxage=N`` when ``shared=True`` (a crawl cache is a shared
       cache), else skipped.
    3. ``max-age=N``.
    4. ``Expires − Date`` (clamped ≥ 0); an Expires that exists but does
       not parse ('0', '-1' — the classic "already stale" idioms) is 0
       per §5.3. A parseable Expires with an unparseable Date falls
       through (no receipt-time column to substitute).
    5. Heuristic §4.2.2: ``heuristic_fraction × (Date − Last-Modified)``
       clamped to [0, heuristic_cap_s].
    6. Otherwise freshness_s NULL, source 'none' (caller policy decides —
       recrawl_intervals' change-rate estimate is the usual fallback).

    The ``Age`` request/response header is deliberately NOT subtracted:
    the crawler stores origin-declared lifetime and computes staleness
    against its own capture wall-clock (latest_capture.committed_at), so
    resident age is known exactly. Pure codegen — regex + date arithmetic,
    no shuffle, no Python."""
    cc = F.coalesce(F.col(cc_col), F.lit(""))
    expires_raw = F.col(expires_col)
    date_ts = col_http_date(F.col(date_col))
    lm_ts = col_http_date(F.col(last_modified_col))
    expires_ts = col_http_date(expires_raw)
    expires_delta = F.greatest(
        F.lit(0).cast("long"),
        (expires_ts.cast("double") - date_ts.cast("double")).cast("long"),
    )
    heuristic = F.least(
        F.greatest(
            F.lit(0).cast("long"),
            ((lm_ts.cast("double") - date_ts.cast("double")) * F.lit(-heuristic_fraction)).cast(
                "long"
            ),
        ),
        F.lit(int(heuristic_cap_s)).cast("long"),
    )
    chain = [
        (_cc_directive(cc, "no-store"), F.lit(0).cast("long"), "no-store"),
        (_cc_directive(cc, "no-cache"), F.lit(0).cast("long"), "no-cache"),
    ]
    if shared:
        chain.append((_cc_seconds(cc, "s-maxage").isNotNull(), _cc_seconds(cc, "s-maxage"), "s-maxage"))
    chain.extend(
        [
            (_cc_seconds(cc, "max-age").isNotNull(), _cc_seconds(cc, "max-age"), "max-age"),
            (expires_raw.isNotNull() & expires_ts.isNull(), F.lit(0).cast("long"), "expires"),
            (expires_ts.isNotNull() & date_ts.isNotNull(), expires_delta, "expires"),
            (date_ts.isNotNull() & lm_ts.isNotNull(), heuristic, "heuristic"),
        ]
    )
    fresh = F.lit(None).cast("long")
    source = F.lit("none")
    for cond, val, name in reversed(chain):
        fresh = F.when(cond, val).otherwise(fresh)
        source = F.when(cond, F.lit(name)).otherwise(source)
    return responses.withColumn("freshness_s", fresh).withColumn("freshness_source", source)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url_canon",
    fp_col: str = "content_fp",
) -> DataFrame:
    """Crawl-to-crawl delta: per URL, `added` / `removed` / `changed` /
    `unchanged` from the content fingerprints of two snapshots — the
    report an operator reads after every recrawl wave (and the input
    `change_rate`'s estimator consumes as ground truth).

    ONE full-outer equi-join on the canonical key is the whole plan; at
    10^10 URLs both sides are the `latest_capture` snapshots the catalog
    already maintains, so with both written bucketed by `url_canon` the
    join is co-located and shuffle-free. Null fingerprints (fetched but
    body-less, e.g. 304 ledger rows) compare via null-safe equality:
    null == null reads `unchanged`, null vs value reads `changed`.
    """
    # presence is tracked separately from the fp (which may be
    # legitimately null on a present row) — fp columns can't encode it
    o = old.select(
        F.col(key_col).alias("k"),
        F.col(fp_col).alias("old_fp"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key_col).alias("k"),
        F.col(fp_col).alias("new_fp"),
        F.lit(True).alias("_in_new"),
    )
    joined = o.join(n, "k", "full_outer")
    verdict = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col("k").alias(key_col), "old_fp", "new_fp", verdict.alias("verdict")
    )


def snapshot_diff_rollup(diff: DataFrame) -> DataFrame:
    """(verdict, n) — the four-line summary a recrawl wave logs."""
    return diff.groupBy("verdict").agg(F.count(F.lit(1)).alias("n"))


# --- Transient-failure retry with exponential backoff ------------------------
# The third recrawl signal: change_rate learns how often content changes,
# http_freshness reads what the origin promises, and retry_backoff_plan
# handles fetches that FAILED for transient reasons (network errors,
# 5xx). Standard crawler discipline (Nutch's db.fetch.retry.max, Heritrix's
# per-URI retry backoff): re-attempt after base·2^(attempts−1) ticks, give
# up past a cap. The reference surfaces the same idea as Crawlee's
# maxRequestRetries pass-through (reference/src/scrapers.ts config).


def retry_backoff_plan(
    captures: DataFrame,
    transient_statuses: tuple[int, ...] = (599,),
    max_retries: int = 3,
    base_delay_ticks: int = 1,
    max_delay_ticks: int = 64,
    url_col: str = "url_canon",
    tick_col: str = "tick",
    seq_col: str = "seq",
    status_col: str = "status",
) -> DataFrame:
    """Per-URL retry verdicts from a capture log (url, tick, seq, status).

    For each URL whose LATEST capture has a transient status, counts the
    run of consecutive transient failures at the tail of its history (a
    non-transient capture resets the run — Nutch's retry-counter-reset
    semantics) and emits:

      (url_col, attempts, last_tick, verdict, due_tick)

    verdict 'retry' with due_tick = last_tick + min(base·2^(attempts−1),
    max_delay_ticks) while attempts ≤ max_retries, else 'give_up'
    (dead-letter; due_tick null). URLs whose latest capture succeeded are
    not returned — they have no pending retry decision.

    Scale shape: one url-keyed window (max over the partition, no sort) +
    a groupBy on the same key — AQE reuses the exchange, so the plan is a
    single shuffle of (url, tick, seq, status) regardless of history
    depth. Pure codegen; deterministic given the ledger.
    """
    is_transient = F.col(status_col).isin(*[int(s) for s in transient_statuses])
    # sortable capture key: ticks are small ints, seq is the deterministic
    # per-fetch ordinal string the frontier assigns — zero-padding the tick
    # makes lexicographic order == (tick, seq) order in every engine
    key = F.format_string("%010d|%s", F.col(tick_col), F.col(seq_col))
    keyed = captures.select(
        F.col(url_col),
        F.col(tick_col).cast("int").alias("_tick"),
        F.col(status_col).cast("int").alias("_status"),
        key.alias("_key"),
        is_transient.alias("_transient"),
    )
    w = Window.partitionBy(url_col)
    stepped = keyed.withColumn(
        "_last_ok_key", F.max(F.when(~F.col("_transient"), F.col("_key"))).over(w)
    )
    tail_fail = F.when(
        F.col("_transient")
        & (F.col("_last_ok_key").isNull() | (F.col("_key") > F.col("_last_ok_key"))),
        1,
    )
    per_url = stepped.groupBy(url_col).agg(
        F.count(tail_fail).alias("attempts"),
        F.max_by("_status", "_key").alias("_last_status"),
        F.max_by("_tick", "_key").alias("last_tick"),
    )
    last_transient = F.col("_last_status").isin(
        *[int(s) for s in transient_statuses]
    )
    delay = F.least(
        (F.lit(base_delay_ticks) * F.pow(F.lit(2.0), F.col("attempts") - 1)).cast("int"),
        F.lit(int(max_delay_ticks)),
    )
    verdict = F.when(F.col("attempts") <= max_retries, F.lit("retry")).otherwise(
        F.lit("give_up")
    )
    due = F.when(F.col("attempts") <= max_retries, F.col("last_tick") + delay)
    return (
        per_url.filter(last_transient)
        .select(
            url_col,
            F.col("attempts").cast("int").alias("attempts"),
            "last_tick",
            verdict.alias("verdict"),
            due.cast("int").alias("due_tick"),
        )
    )


#: Per-URL retry state ENTERING a tick (the online form of
#: retry_backoff_plan, maintained incrementally by the Crawler): the six
#: frontier columns verbatim (so due rows re-enter the frontier with a
#: plain select) + the consecutive-failure count and the earliest tick the
#: next attempt may run.
def retry_state_schema():
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("url_canon", StringType(), False),
            StructField("url_hash", LongType(), False),
            StructField("host", StringType(), False),
            StructField("priority", IntegerType(), False),
            StructField("discovered_tick", IntegerType(), False),
            StructField("seq", StringType(), False),
            StructField("attempts", IntegerType(), False),
            StructField("due_tick", IntegerType(), False),
        ]
    )
