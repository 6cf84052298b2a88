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
