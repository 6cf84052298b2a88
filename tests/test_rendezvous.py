"""Rendezvous shard routing (layout.rendezvous_assign) and the streaming
CMS twin (streaming.stream_cms)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark import streaming
from spider_spark.operators import layout
from spider_spark.operators import sketches as sk


def _ref_assign(key: str, shards):
    """Independent restatement: first-8-hex of md5('key:shard') as int,
    argmax, ties toward the lexicographically largest shard."""
    best = None
    for s in shards:
        h = int(hashlib.md5(f"{key}:{s}".encode()).hexdigest()[:8], 16)
        if best is None or (h, s) > best:
            best = (h, s)
    return best[1]


def test_rendezvous_matches_reference(spark):
    shards = ["s-a", "s-b", "s-c", "s-d"]
    df = spark.range(300).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["shard"]
        for r in layout.rendezvous_assign(df, shards).collect()
    }
    for k, s in got.items():
        assert s == _ref_assign(str(k), shards), k
    # rough balance: every shard gets something
    from collections import Counter

    c = Counter(got.values())
    assert set(c) == set(shards)
    assert min(c.values()) > 0.1 * 300 / 4


def test_rendezvous_minimal_movement(spark):
    """The HRW property: adding a shard moves keys ONLY onto the new
    shard, and roughly 1/(n+1) of them."""
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    before = {
        r["doc_id"]: r["shard"]
        for r in layout.rendezvous_assign(df, ["s0", "s1", "s2"]).collect()
    }
    after = {
        r["doc_id"]: r["shard"]
        for r in layout.rendezvous_assign(df, ["s0", "s1", "s2", "s3"]).collect()
    }
    moved = [k for k in before if before[k] != after[k]]
    assert all(after[k] == "s3" for k in moved)
    assert 0.15 <= len(moved) / 1000 <= 0.35  # ≈ 1/4


def test_rendezvous_validation(spark):
    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        layout.rendezvous_assign(df, [])
    with pytest.raises(ValueError):
        layout.rendezvous_assign(df, ["a", "a"])


def test_stream_cms_twin_matches_batch(spark, tmp_path):
    src = str(tmp_path / "keys")
    pdf = pd.DataFrame(
        {"key": [f"h{i % 13}" for i in range(400)] + [None] * 10}
    )
    spark.createDataFrame(pdf).repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    counters = streaming.stream_cms(stream, "key", depth=3, width=64)
    q = (
        counters.writeStream.format("memory")
        .queryName("cms_twin")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["hrow"], r["bucket"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_twin").collect()
    }
    batch = {
        (r["hrow"], r["bucket"]): r["cnt"]
        for r in sk.count_min_sketch(
            spark.read.parquet(src), "key", depth=3, width=64
        ).collect()
    }
    assert streamed == batch and len(batch) > 0
    # bounded state: the sketch can never exceed depth×width rows
    assert len(streamed) <= 3 * 64
