"""Structured Streaming variant of the extraction pipeline (SURVEY.md §2.13).

The reference has no streaming concepts; the batch-tick crawl is the primary
design because exact crawl-order replay needs a barrier per round. This
module provides the streaming form for the *extraction* side — useful when
pages arrive continuously (e.g. a WARC drop folder) and ordering is not part
of the contract:

- ``stream_pages``: file-source stream over a pages directory (same schema
  as the batch table),
- ``stream_extract``: the byte-identical parse UDF applied per micro-batch
  (stateless — identical results to batch),
- ``stream_metrics``: watermarked tumbling-window fetch metrics; late pages
  beyond the watermark are dropped, the streaming analog of "re-discovered
  URLs are dropped by the seen-filter",
- ``run_available_now``: drain everything currently in the source and stop
  (used by tests; production would run continuous triggers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import udfs
from .synth import PAGES_SCHEMA


def stream_pages(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_extract(pages: DataFrame) -> DataFrame:
    """Stateless parse per micro-batch — same UDF as the batch tick, so
    streamed output is byte-identical to batch output for the same rows."""
    parsed = pages.withColumn("parsed", udfs.parse_page(F.col("url"), F.col("html")))
    return parsed.select(
        "url",
        "warc_ts",
        F.col("parsed.text").alias("text"),
        F.col("parsed.title").alias("title"),
        F.col("parsed.detected").alias("detected"),
        F.size(F.coalesce(F.col("parsed.links"), F.array())).alias("link_count"),
        "lang",
    )


def stream_metrics(pages: DataFrame, window: str = "1 minute", watermark: str = "2 minutes") -> DataFrame:
    """Watermarked tumbling-window rollup of pages/links per language —
    the streaming ScrapeMetrics (§2.7). Late rows past the watermark drop."""
    extracted = stream_extract(pages)
    return (
        extracted.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum("link_count").alias("n_links"),
        )
        .select(F.col("w.start").alias("window_start"), "lang", "n_pages", "n_links")
    )


def stream_trending_terms(
    pages: DataFrame,
    window: str = "60 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window term counts over the streamed pages'
    extracted text — the streaming half of ``operators.trends``: emits
    (window_start_epoch, term, n) with IDENTICAL semantics to the batch
    ``trends.term_window_counts`` over the same rows (asserted in
    tests), so the lift/burst step (``trends.trending_terms``) runs as a
    batch job over the sink — adjacent-window lift needs the previous
    window CLOSED, which is exactly what the watermark guarantees by the
    time the row is in the sink. Late rows past the watermark drop."""
    from spider_spark.operators.trends import col_index_tokens

    extracted = stream_extract(pages)
    terms = extracted.select(
        "warc_ts", F.explode(col_index_tokens("text")).alias("term")
    )
    return (
        terms.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("_w"), "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("_w.start")).alias("window_start_epoch"),
            "term",
            "n",
        )
    )


def stream_cms(
    keyed: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Streaming Count-Min Sketch — the running frontier-telemetry twin
    of ``operators.sketches.count_min_sketch``: the aggregation STATE is
    the sketch itself (≤ depth×width counter rows), so an unbounded key
    stream — hosts seen, URL patterns, error codes — tracks in constant
    memory with no watermark and no key-cardinality risk; that is the
    whole reason CMS exists. Run with complete/update output mode; the
    counters in the sink at any instant equal the batch sketch over every
    row ingested so far (asserted by the twin test), so point estimates
    come from batch ``sketches.cms_estimate`` over the sink."""
    from spider_spark.operators.sketches import col_cms_bucket

    key = F.col(key_col).cast("string")
    pairs = keyed.where(key.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("hrow"),
                        col_cms_bucket(key, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb")
    )
    return pairs.groupBy(
        F.col("rb.hrow").alias("hrow"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def stream_first_seen(links: DataFrame, num_shards: int = 32) -> DataFrame:
    """Stateful streaming URL-seen filter: emit each canonical URL exactly
    once across all micro-batches (``applyInPandasWithState``), sharded by
    ``pmod(url_hash, num_shards)`` — the same partitioning discipline as
    the batch seen-filter, with the seen set living in the state store
    instead of a snapshot table.

    Input columns: (url_hash long, url_canon string). First-seen wins per
    arrival order within the stream — the streaming analog of the batch
    engine's left_anti against url_seen (links.ts:31-35 keep-first,
    crawl-wide). Identity is the (url_hash, url_canon) PAIR, matching the
    batch anti-join — a 64-bit hash alone would silently drop colliding
    never-seen URLs.

    STATE SCHEMA v2 (hashes + urls arrays): checkpoints written by the v1
    hash-only schema cannot be resumed — Structured Streaming state
    schemas are not migratable in place; drain the old query and start a
    fresh checkpoint (deliberate breaking change for collision-proofness)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def dedupe(key, pdf_iter, state: GroupState):
        seen = set(zip(state.get[0], state.get[1])) if state.exists else set()
        out_h, out_u = [], []
        for pdf in pdf_iter:
            for h, u in zip(pdf["url_hash"], pdf["url_canon"]):
                k = (int(h), u)
                if k not in seen:
                    seen.add(k)
                    out_h.append(k[0])
                    out_u.append(u)
        state.update(([h for h, _ in seen], [u for _, u in seen]))
        yield pd.DataFrame({"url_hash": out_h, "url_canon": out_u})

    sharded = links.withColumn("shard", F.pmod(F.col("url_hash"), F.lit(num_shards)))
    return sharded.groupBy("shard").applyInPandasWithState(
        dedupe,
        outputStructType="url_hash long, url_canon string",
        stateStructType="hashes array<long>, urls array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(df: DataFrame, checkpoint: str, out_path: str, out_format: str = "parquet"):
    """Drain the source with the available-now trigger and block until done
    — exactly-once via the checkpoint dir (the streaming analog of the
    tick-commit manifest)."""
    q = (
        df.writeStream.format(out_format)
        .option("checkpointLocation", checkpoint)
        .option("path", out_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization — the continuous twin of
    ``operators.sessions.session_stats``: Structured Streaming's
    ``session_window`` merges a user's events whose gaps stay under
    ``gap``; the watermark closes (and EVICTS from the state store) any
    session once event time passes its end + watermark, so state is
    bounded by the number of OPEN sessions regardless of runtime length.
    Emits one row per closed session: (user, session_start, session_end,
    n_events) — append mode, only final sessions, the exactly-once
    discipline of the batch tick commit."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def watermark_lateness_audit(
    events: DataFrame,
    delay: str = "10 minutes",
    window: str = "1 hour",
    ts_col: str = "ts",
    arrival_col: str = "event_id",
    bucket_size: int = 1024,
) -> DataFrame:
    """Batch audit of what a ``withWatermark(ts, delay)`` streaming job
    WOULD drop: replay the log in arrival order (``arrival_col`` — the
    ingestion sequence), track the running watermark max(ts seen so
    far) − delay, and flag every event whose timestamp is already
    behind it. Returns per tumbling ``window`` of EVENT time:
    (window_start, n_events, n_late, late_frac_r) — the
    watermark-tuning report you read BEFORE picking the streaming
    twins' delay (too tight silently drops the slow tail; too loose
    bloats state).

    Physical shape — the running max over arrival order is a prefix
    scan, and one global ORDER BY arrival window is one task eating the
    log; max is associative, so it is computed TWO-LEVEL (the
    postings_compression_stats gap discipline): (1) running max within
    (arrival div bucket_size) buckets — every window task bounded by
    the bucket width; (2) one window over the BUCKET-SUMMARY rows
    (n/bucket_size of them) supplies the prefix max of all earlier
    buckets; the exclusive watermark before each event combines the
    two. The oracle restates the single sequential window — the levels
    must reproduce it exactly."""
    if bucket_size < 2:
        raise ValueError("bucket_size must be >= 2")
    from pyspark.sql import Window

    d = F.expr(f"INTERVAL {delay}")
    ev = events.select(
        F.col(arrival_col).alias("arr"), F.col(ts_col).alias("ts")
    ).withColumn("bkt", F.expr(f"arr div {int(bucket_size)}"))
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("arr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ev.withColumn("loc_max", F.max("ts").over(w_in))
    bsum = ev.groupBy("bkt").agg(F.max("ts").alias("bmax"))
    w_b = (
        Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = bsum.withColumn("pre_max", F.max("bmax").over(w_b)).select(
        "bkt", "pre_max"
    )
    flagged = (
        local.join(prefix, "bkt")
        .withColumn("high", F.greatest(F.col("loc_max"), F.col("pre_max")))
        .withColumn(
            "late",
            F.col("high").isNotNull() & (F.col("ts") < F.col("high") - d),
        )
    )
    return (
        flagged.groupBy(F.window("ts", window).getField("start").alias(
            "window_start"
        ))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("late").cast("long")).alias("n_late"),
            F.round(
                F.sum(F.col("late").cast("long")) / F.count(F.lit(1)), 6
            ).alias("late_frac_r"),
        )
    )


def stream_content_seen(captures: DataFrame, num_shards: int = 32) -> DataFrame:
    """Stateful streaming content-seen filter (Mercator §4.2.1 online):
    every capture gets a verdict the moment it arrives — 'first' if its
    content fingerprint is new across ALL micro-batches so far,
    'duplicate' (with the first-encounter URL attributed) otherwise.
    The streaming twin of the batch `dedup.content_seen_report`, with
    the fp→first_url map living in the state store sharded by
    ``pmod(content_fp, num_shards)`` — the same partitioning discipline
    as `stream_first_seen`.

    Input columns: (url_canon string, content_fp long). Null-fp rows
    (bodyless captures) must be filtered by the caller — there is
    nothing to compare, and the batch operator already gives them
    'first' by definition.

    Batch-parity contract (pinned in tests): for the same rows in the
    same arrival order, verdicts and first_url attribution equal the
    batch report's when the batch key is that arrival order."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def judge(key, pdf_iter, state: GroupState):
        first_by_fp = (
            dict(zip(state.get[0], state.get[1])) if state.exists else {}
        )
        out_u, out_fp, out_v, out_first = [], [], [], []
        for pdf in pdf_iter:
            for u, fp in zip(pdf["url_canon"], pdf["content_fp"]):
                fp = int(fp)
                owner = first_by_fp.get(fp)
                out_u.append(u)
                out_fp.append(fp)
                if owner is None:
                    first_by_fp[fp] = u
                    out_v.append("first")
                    out_first.append(None)
                else:
                    out_v.append("duplicate")
                    out_first.append(owner)
        state.update(
            (list(first_by_fp.keys()), list(first_by_fp.values()))
        )
        yield pd.DataFrame(
            {
                "url_canon": out_u,
                "content_fp": out_fp,
                "verdict": out_v,
                "first_url": out_first,
            }
        )

    sharded = captures.withColumn(
        "shard", F.pmod(F.col("content_fp"), F.lit(num_shards))
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        judge,
        outputStructType=(
            "url_canon string, content_fp long, verdict string,"
            " first_url string"
        ),
        stateStructType="fps array<long>, urls array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_percolate(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Streaming prospective search — the per-tick twin of
    ``operators.index.percolate`` (the Elasticsearch-percolator shape):
    every micro-batch of fresh documents alerts on the standing
    conjunctive queries it satisfies. Output (doc_id, query_id, n_terms),
    append mode, SEMANTICS IDENTICAL to the batch percolator over the
    same rows (asserted by the twin test).

    Physical shape: percolation is stateless per document — the right
    streaming form is a map-only projection, not a stateful aggregation.
    The standing-query registry is tokenized ONCE with the exact batch
    tokenizer (``col_index_tokens`` on the queries frame) and folded into
    the plan as a broadcast literal — a registry of standing alerts is
    driver-bounded by design (thousands of rows, the same bound the batch
    operator's broadcast join relies on). Each doc computes its distinct
    term set once, then a conjunction check per query via array algebra —
    no shuffle, no state store, watermark-free append."""
    from .operators.index import col_index_tokens

    regs = (
        queries.select(
            F.col("query_id"),
            F.array_distinct(col_index_tokens("query")).alias("_qt"),
        )
        .where(F.size("_qt") > 0)
        .collect()
    )
    if not regs:
        raise ValueError("percolate needs at least one non-empty standing query")
    reg_lit = F.array(
        *[
            F.struct(
                F.lit(int(r.query_id)).alias("query_id"),
                F.array(*[F.lit(t) for t in r._qt]).alias("qt"),
            )
            for r in regs
        ]
    )
    toks = F.array_distinct(col_index_tokens(text_col))
    matched = F.filter(
        reg_lit,
        lambda q: F.forall(q.qt, lambda t: F.array_contains(toks, t)),
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(matched).alias("q")
        )
        .select(
            "doc_id",
            F.col("q.query_id").alias("query_id"),
            F.size("q.qt").alias("n_terms"),
        )
    )


def stream_trending_lift(
    counts: DataFrame,
    window_minutes: int = 60,
    min_count: int = 1,
) -> DataFrame:
    """Stateful streaming lift over CLOSED window counts — the
    applyInPandasWithState twin of ``operators.trends.trending_terms``'s
    lag step. Input is a stream of finalized (window_start_epoch, term,
    n) rows — e.g. the sink of ``stream_trending_terms``, whose
    watermark guarantees a window's count is final before it lands —
    and the state per term is just (last_window_start_epoch, last_n):
    constant per key, unbounded stream.

    Semantics pinned to the batch operator: ``prev_n``/``lift_r`` are
    null unless the previous window is exactly adjacent
    (window_minutes·60 earlier — cold starts and gaps yield nulls, not
    stale lifts), ``lift_r = round(n/prev_n, 6)``, and ``min_count``
    filters OUTPUT rows only, after lift. Multiple windows for one term
    arriving in a single micro-batch are processed in window order."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    step = window_minutes * 60

    def lift(key, pdf_iter, state: GroupState):
        last_ws, last_n = state.get if state.exists else (None, None)
        out = []
        batch = pd.concat(list(pdf_iter), ignore_index=True)
        batch = batch.sort_values("window_start_epoch")
        for ws, n in zip(batch["window_start_epoch"], batch["n"]):
            ws, n = int(ws), int(n)
            prev = last_n if (last_ws is not None and ws - last_ws == step) else None
            lift_r = round(n / prev, 6) if prev else None
            if n >= min_count:
                out.append((ws, key[0], n, prev, lift_r))
            last_ws, last_n = ws, n
        state.update((last_ws, last_n))
        yield pd.DataFrame(
            out,
            columns=["window_start_epoch", "term", "n", "prev_n", "lift_r"],
        )

    return counts.groupBy("term").applyInPandasWithState(
        lift,
        outputStructType=(
            "window_start_epoch long, term string, n long,"
            " prev_n long, lift_r double"
        ),
        stateStructType="last_ws long, last_n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
