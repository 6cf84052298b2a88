"""Structured-streaming extraction parity: streamed output byte-identical
to batch output for the same pages (SURVEY.md §2.13)."""

from __future__ import annotations

from spider_spark import streaming, synth, udfs
from pyspark.sql import functions as F


def test_stream_extract_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages")
    synth.generate_pages(spark, 120, n_hosts=6).write.parquet(src)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = streaming.stream_pages(spark, src, max_files_per_trigger=2)
    streaming.run_available_now(streaming.stream_extract(stream), ckpt, out)

    streamed = {r.url: (r.text, r.link_count) for r in spark.read.parquet(out).collect()}
    batch_df = spark.read.parquet(src).withColumn(
        "parsed", udfs.parse_page(F.col("url"), F.col("html"))
    )
    batch = {
        r.url: (r.parsed.text, len(r.parsed.links or []))
        for r in batch_df.select("url", "parsed").collect()
    }
    assert streamed == batch
    # byte-identity vs the generator's oracle text column
    oracle = {r.url: r.text for r in spark.read.parquet(src).select("url", "text").collect()}
    for url, (text, _) in streamed.items():
        assert text == oracle[url]


def test_stream_metrics_windowed(spark, tmp_path):
    src = str(tmp_path / "pages")
    synth.generate_pages(spark, 60, n_hosts=4).write.parquet(src)
    stream = streaming.stream_pages(spark, src)
    metrics = streaming.stream_metrics(stream, window="10 minutes", watermark="1 hour")
    # complete mode: windows visible without waiting for the watermark to
    # close them (append-to-file would hold them back — by design)
    q = (
        metrics.writeStream.format("memory")
        .queryName("mwin")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM mwin").collect()
    assert sum(r.n_pages for r in rows) == 60
    assert all(r.n_links >= 0 for r in rows)


def test_stream_first_seen_exactly_once_across_batches(spark, tmp_path):
    """The stateful seen-filter emits each URL once even when it reappears
    in later micro-batches (state store holds the seen set per shard)."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = tmp_path / "links"
    src.mkdir()
    # two files = two micro-batches (maxFilesPerTrigger=1), overlapping URLs
    b0 = pd.DataFrame({"url_canon": [f"https://h{i%4}.test/p{i}" for i in range(50)]})
    b1 = pd.DataFrame({"url_canon": [f"https://h{i%4}.test/p{i}" for i in range(25, 75)]})
    spark.createDataFrame(b0).coalesce(1).write.parquet(str(src / "f0"))
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "f1"))

    stream = (
        spark.readStream.schema("url_canon string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .withColumn("url_hash", F.xxhash64("url_canon"))
    )
    from spider_spark import streaming

    deduped = streaming.stream_first_seen(stream, num_shards=8)
    q = (
        deduped.writeStream.format("memory")
        .queryName("firstseen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT url_canon FROM firstseen").collect()
    urls = [r.url_canon for r in rows]
    assert len(urls) == len(set(urls)) == 75  # 50 + 50 with 25 overlap


def test_watermark_lateness_audit_matches_sequential(spark):
    import datetime as dt

    import pytest as _pytest

    from spider_spark.streaming import watermark_lateness_audit

    base = dt.datetime(2024, 1, 1)
    # arrival order scrambles event time: every 5th event arrives 30
    # minutes stale, every 11th arrives slightly early
    rows = []
    for i in range(300):
        ts = base + dt.timedelta(minutes=i)
        if i % 5 == 0:
            ts -= dt.timedelta(minutes=30)
        if i % 11 == 0:
            ts += dt.timedelta(minutes=3)
        rows.append((i, ts))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {
        r["window_start"]: (r["n_events"], r["n_late"], r["late_frac_r"])
        for r in watermark_lateness_audit(
            df, delay="10 minutes", window="1 hour", bucket_size=16
        ).collect()
    }

    # sequential reference
    hi = None
    per_win = {}
    for i, ts in rows:
        late = hi is not None and ts < hi - dt.timedelta(minutes=10)
        ws = ts.replace(minute=0, second=0, microsecond=0)
        n, l = per_win.get(ws, (0, 0))
        per_win[ws] = (n + 1, l + late)
        hi = ts if hi is None else max(hi, ts)
    want = {
        ws: (n, l, round(l / n, 6)) for ws, (n, l) in per_win.items()
    }
    assert got == want
    assert sum(l for _, l, _ in got.values()) > 0  # staleness actually fired

    with _pytest.raises(ValueError):
        watermark_lateness_audit(df, bucket_size=1)


def test_stream_content_seen_verdicts_across_batches(spark, tmp_path):
    """Online content-seen: 'first' exactly once per fingerprint across
    micro-batches, duplicates attributed to the first-encounter URL even
    when the duplicate arrives in a LATER batch (state store carries the
    fp→first_url map)."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = tmp_path / "caps"
    src.mkdir()
    # batch 0: contents c0..c9 on urls a0..a9, plus an in-batch dup of c3
    b0 = pd.DataFrame({
        "url_canon": [f"https://a.test/{i}" for i in range(10)] + ["https://a.test/dup3"],
        "content": [f"c{i}" for i in range(10)] + ["c3"],
    })
    # batch 1: new contents c10..c14 + cross-batch dups of c0 and c7
    b1 = pd.DataFrame({
        "url_canon": [f"https://b.test/{i}" for i in range(10, 15)]
        + ["https://b.test/dup0", "https://b.test/dup7"],
        "content": [f"c{i}" for i in range(10, 15)] + ["c0", "c7"],
    })
    spark.createDataFrame(b0).coalesce(1).write.parquet(str(src / "f0"))
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "f1"))

    stream = (
        spark.readStream.schema("url_canon string, content string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .withColumn("content_fp", F.xxhash64("content"))
        .drop("content")
    )
    from spider_spark import streaming

    judged = streaming.stream_content_seen(stream, num_shards=4)
    q = (
        judged.writeStream.format("memory")
        .queryName("contentseen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT url_canon, verdict, first_url FROM contentseen"
    ).collect()
    by_url = {r.url_canon: (r.verdict, r.first_url) for r in rows}
    assert len(by_url) == 18
    firsts = [u for u, (v, _) in by_url.items() if v == "first"]
    assert len(firsts) == 15  # c0..c14 exactly once each
    assert by_url["https://a.test/dup3"] == ("duplicate", "https://a.test/3")
    assert by_url["https://b.test/dup0"] == ("duplicate", "https://a.test/0")
    assert by_url["https://b.test/dup7"] == ("duplicate", "https://a.test/7")


def test_stream_percolate_matches_batch(spark, tmp_path):
    """The streaming percolator (map-only, registry folded as a literal)
    must produce exactly the batch operator's (doc_id, query_id, n_terms)
    rows over the same documents — across micro-batch boundaries."""
    import pandas as pd

    from spider_spark import streaming
    from spider_spark.operators import index as index_ops

    queries = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma"), (2, "alpha delta"), (3, "beta beta")],
        "query_id long, query string",
    )
    texts = [
        "alpha beta gamma",      # matches 0,1,3
        "alpha delta",           # matches 2
        "beta",                  # matches 3
        "unrelated words here",  # matches none
        "gamma alpha beta delta" # matches all
    ]
    docs = [(f"https://t.test/{i}", t) for i, t in enumerate(texts)]

    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(docs[:3], "url string, text string").coalesce(1).write.parquet(str(src / "f0"))
    spark.createDataFrame(docs[3:], "url string, text string").coalesce(1).write.parquet(str(src / "f1"))

    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        streaming.stream_percolate(stream, queries)
        .writeStream.format("memory")
        .queryName("perc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.doc_id, r.query_id, r.n_terms)
        for r in spark.sql("SELECT * FROM perc").collect()
    }
    batch = spark.createDataFrame(docs, "url string, text string")
    want = {
        (r.doc_id, r.query_id, r.n_terms)
        for r in index_ops.percolate(batch, queries, id_col="url", text_col="text").collect()
    }
    assert got == want and len(want) >= 7


def test_stream_trending_lift_matches_batch(spark, tmp_path):
    """The stateful lift twin over closed window counts equals the batch
    trending_terms lag step on the same events: adjacency nulls at gaps,
    round-6 lift, min_count output filtering — with windows split across
    micro-batches so the state store carries prev counts between them."""
    import datetime as dt

    from pyspark.sql import functions as F
    from spider_spark import streaming
    from spider_spark.operators import trends

    base = dt.datetime(2024, 3, 1)
    rows = []
    # term 'a': windows 0,1,2 rising; term 'b': windows 0 and 2 (gap);
    # term 'c': only window 3
    for w, k in [(0, 2), (1, 4), (2, 8)]:
        rows += [("a", base + dt.timedelta(hours=w, minutes=i)) for i in range(k)]
    for w, k in [(0, 5), (2, 5)]:
        rows += [("b", base + dt.timedelta(hours=w, minutes=i)) for i in range(k)]
    rows += [("c", base + dt.timedelta(hours=3),)]
    events = spark.createDataFrame(rows, "term string, warc_ts timestamp")

    counts = trends.term_window_counts(events, term_col="term").collect()
    # stream the counts window-by-window: windows 0-1 in batch one,
    # windows 2-3 in batch two (closure order)
    early = [r for r in counts if r.window_start_epoch <= int(base.timestamp()) + 3600]
    late = [r for r in counts if r.window_start_epoch > int(base.timestamp()) + 3600]
    src = tmp_path / "counts"
    src.mkdir()
    schema = "window_start_epoch long, term string, n long"
    spark.createDataFrame(early, schema).coalesce(1).write.parquet(str(src / "f0"))
    spark.createDataFrame(late, schema).coalesce(1).write.parquet(str(src / "f1"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        streaming.stream_trending_lift(stream, window_minutes=60)
        .writeStream.format("memory")
        .queryName("lift")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start_epoch, r.term): (r.n, r.prev_n, r.lift_r)
        for r in spark.sql("SELECT * FROM lift").collect()
    }
    want = {
        (r.window_start_epoch, r.term): (r.n, r.prev_n, r.lift_r)
        for r in trends.trending_terms(events, term_col="term").collect()
    }
    assert got == want
    # the interesting cells: a's lift crosses the micro-batch boundary,
    # b's gap yields null lift, c's cold start yields null
    a2 = got[(int((base + dt.timedelta(hours=2)).timestamp()), "a")]
    assert a2 == (8, 4, 2.0)
    b2 = got[(int((base + dt.timedelta(hours=2)).timestamp()), "b")]
    assert b2 == (5, None, None)
