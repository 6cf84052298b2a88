"""Shard-local seen-filter shipping (round-5): each probe task receives at
most ONE shard's blob, null hashes never crash a tick, oversize shard
configs fail fast, and the broadcast fallback is tracked for reclamation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark import shardprobe
from spider_spark.bloom import build_bloom_shards, split_by_bloom
from spider_spark.cuckoo import build_cuckoo_shards, split_by_cuckoo


def _hash_df(spark, name, lo, hi):
    return spark.range(lo, hi).select(
        F.xxhash64(F.concat(F.lit(name), F.col("id"))).alias("url_hash"),
        F.concat(F.lit("u"), F.col("id")).alias("url_canon"),
    )


def _split_sets(pair):
    new, maybe = pair
    return (
        {r.url_canon for r in new.collect()},
        {r.url_canon for r in maybe.collect()},
    )


def test_bloom_sharded_matches_broadcast(spark):
    seen = _hash_df(spark, "x", 0, 2000)
    cand = _hash_df(spark, "x", 1500, 4000)
    bloom = build_bloom_shards(seen, num_shards=8, bits_per_shard=1 << 16)
    assert _split_sets(
        split_by_bloom(cand, bloom, num_shards=8, bits_per_shard=1 << 16, mode="sharded")
    ) == _split_sets(
        split_by_bloom(cand, bloom, num_shards=8, bits_per_shard=1 << 16, mode="broadcast")
    )


def test_cuckoo_sharded_matches_broadcast(spark):
    seen = _hash_df(spark, "y", 0, 2000)
    cand = _hash_df(spark, "y", 1500, 4000)
    cuckoo = build_cuckoo_shards(seen, num_shards=8, buckets_per_shard=1 << 10)
    assert _split_sets(split_by_cuckoo(cand, cuckoo, num_shards=8, mode="sharded")) == _split_sets(
        split_by_cuckoo(cand, cuckoo, num_shards=8, mode="broadcast")
    )


@pytest.mark.parametrize("mode", ["sharded", "broadcast"])
def test_null_url_hash_is_definitely_new(spark, mode):
    """ADVICE r04: a malformed candidate row (null url_hash) must route to
    definitely_new (pre-accelerator dropna semantics), not crash the tick."""
    seen = _hash_df(spark, "x", 0, 500)
    bloom = build_bloom_shards(seen, num_shards=4, bits_per_shard=1 << 14)
    cand = _hash_df(spark, "x", 0, 10).unionByName(
        spark.sql("SELECT CAST(NULL AS BIGINT) url_hash, 'nullrow' url_canon")
    )
    new, maybe = split_by_bloom(cand, bloom, num_shards=4, bits_per_shard=1 << 14, mode=mode)
    assert "nullrow" in {r.url_canon for r in new.collect()}
    assert maybe.count() == 10  # the 10 truly-seen rows still probe maybe


def test_cuckoo_null_url_hash_is_definitely_new(spark):
    seen = _hash_df(spark, "y", 0, 500)
    cuckoo = build_cuckoo_shards(seen, num_shards=4, buckets_per_shard=1 << 9)
    cand = _hash_df(spark, "y", 0, 10).unionByName(
        spark.sql("SELECT CAST(NULL AS BIGINT) url_hash, 'nullrow' url_canon")
    )
    for mode in ("sharded", "broadcast"):
        new, maybe = split_by_cuckoo(cand, cuckoo, num_shards=4, mode=mode)
        assert "nullrow" in {r.url_canon for r in new.collect()}
        assert maybe.count() == 10


def test_oversize_shard_config_fails_fast(spark):
    """A config whose per-shard blob exceeds the documented cap must raise
    BEFORE launching a job, with instructions to raise num_shards."""
    seen = _hash_df(spark, "x", 0, 10)
    bloom = build_bloom_shards(seen, num_shards=4, bits_per_shard=1 << 14)
    with pytest.raises(ValueError, match="num_shards"):
        split_by_bloom(seen, bloom, num_shards=1, bits_per_shard=(1 << 33))
    with pytest.raises(ValueError, match="num_shards"):
        build_cuckoo_shards(seen, num_shards=1, buckets_per_shard=1 << 28, slots=8)


def test_one_shard_per_task_asserted(spark):
    """A shards table that double-keys a shard id (e.g. a bad merge) must
    fail loudly inside the task, never probe an arbitrary blob."""
    seen = _hash_df(spark, "x", 0, 200)
    bloom = build_bloom_shards(seen, num_shards=2, bits_per_shard=1 << 14)
    doubled = bloom.unionByName(bloom)
    new, maybe = split_by_bloom(seen, doubled, num_shards=2, bits_per_shard=1 << 14)
    with pytest.raises(Exception, match="invariant"):
        new.count()


def test_no_whole_filter_on_driver_in_sharded_mode(spark, monkeypatch):
    """Sharded mode must never collect() the shards table to the driver —
    that is the whole point of the round-5 shape."""
    from pyspark.sql import DataFrame

    seen = _hash_df(spark, "x", 0, 200)
    bloom = build_bloom_shards(seen, num_shards=4, bits_per_shard=1 << 14)
    orig = DataFrame.collect
    collected: list = []

    def spy(self):
        collected.append(self)
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", spy)
    new, maybe = split_by_bloom(seen, bloom, num_shards=4, bits_per_shard=1 << 14)
    n = new.count() + maybe.count()
    assert n == 200
    assert collected == []  # .count() actions only; no blob ever driver-side


def test_broadcast_mode_tracked_and_released(spark):
    shardprobe.release_probe_broadcasts()  # clean slate
    seen = _hash_df(spark, "x", 0, 200)
    bloom = build_bloom_shards(seen, num_shards=4, bits_per_shard=1 << 14)
    new, maybe = split_by_bloom(
        seen, bloom, num_shards=4, bits_per_shard=1 << 14, mode="broadcast"
    )
    assert new.count() + maybe.count() == 200
    assert len(shardprobe._LIVE_BROADCASTS) == 1
    shardprobe.release_probe_broadcasts()
    assert shardprobe._LIVE_BROADCASTS == []
