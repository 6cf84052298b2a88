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


def test_broadcast_mode_tracking_is_opt_in(spark):
    """track=False (the default, for library call sites like BFF) must
    NOT pin the broadcast in the module registry — reclamation stays with
    GC + ContextCleaner as before; track=True (the crawler tick, which
    calls release after its actions) registers for scope-owned release."""
    shardprobe.release_probe_broadcasts()  # clean slate
    seen = _hash_df(spark, "x", 0, 200)
    bloom = build_bloom_shards(seen, num_shards=4, bits_per_shard=1 << 14)
    new, maybe = split_by_bloom(
        seen, bloom, num_shards=4, bits_per_shard=1 << 14, mode="broadcast"
    )
    assert new.count() + maybe.count() == 200
    assert shardprobe._LIVE_BROADCASTS == []  # untracked by default
    new, maybe = split_by_bloom(
        seen, bloom, num_shards=4, bits_per_shard=1 << 14, mode="broadcast", track=True
    )
    assert new.count() + maybe.count() == 200
    assert len(shardprobe._LIVE_BROADCASTS) == 1
    shardprobe.release_probe_broadcasts()
    assert shardprobe._LIVE_BROADCASTS == []


def test_broadcast_mode_null_sharing_a_batch_does_not_corrupt(spark):
    """Regression (r5 review, reproduced): a null url_hash coalesced into
    the SAME Arrow batch as valid hashes used to convert the int64 column
    to float64, silently corrupting xxhash64 values above 2^53 — seen
    URLs were misclassified definitely_new, breaking the no-refetch
    invariant. Nulls are now split off at the plan level; the UDF asserts
    a true int64 arrival."""
    seen = _hash_df(spark, "x", 0, 10)
    bloom = build_bloom_shards(seen, num_shards=4, bits_per_shard=1 << 14)
    cand = (
        seen.unionByName(
            spark.sql("SELECT CAST(NULL AS BIGINT) url_hash, 'nullrow' url_canon")
        )
        .coalesce(1)  # force one partition → one batch mixing null + valid
    )
    for mode in ("broadcast", "sharded"):
        new, maybe = split_by_bloom(
            cand, bloom, num_shards=4, bits_per_shard=1 << 14, mode=mode
        )
        assert maybe.count() == 10, mode  # ALL truly-seen rows probe maybe
        assert {r.url_canon for r in new.collect()} == {"nullrow"}, mode
    cuckoo = build_cuckoo_shards(seen, num_shards=4, buckets_per_shard=1 << 9)
    for mode in ("broadcast", "sharded"):
        new, maybe = split_by_cuckoo(cand, cuckoo, num_shards=4, mode=mode)
        assert maybe.count() == 10, mode
        assert {r.url_canon for r in new.collect()} == {"nullrow"}, mode


def test_sharded_salts_parity(spark):
    """The salt sub-sharding (row-side memory/parallelism knob) must not
    change the split for any salt count."""
    seen = _hash_df(spark, "x", 0, 1000)
    cand = _hash_df(spark, "x", 500, 2000)
    bloom = build_bloom_shards(seen, num_shards=8, bits_per_shard=1 << 16)
    base = _split_sets(
        split_by_bloom(cand, bloom, num_shards=8, bits_per_shard=1 << 16, salts=1)
    )
    for s in (2, 4, 7):
        assert (
            _split_sets(
                split_by_bloom(
                    cand, bloom, num_shards=8, bits_per_shard=1 << 16, salts=s
                )
            )
            == base
        ), s


def test_filter_unseen_probe_runs_once(spark):
    """filter_unseen_with_bloom persists the flagged frame, so consuming
    its result must evaluate the probe's cogroup once, not once per split
    branch — pinned by counting probe invocations via an accumulator."""
    from spider_spark.bloom import filter_unseen_with_bloom

    seen = _hash_df(spark, "x", 0, 1000)
    cand = _hash_df(spark, "x", 500, 2000)
    bloom = build_bloom_shards(seen, num_shards=4, bits_per_shard=1 << 16)
    acc = spark.sparkContext.accumulator(0)
    import spider_spark.bloom as bloom_mod

    orig = bloom_mod._probe_blob

    def counting(blob, arr, num_hashes):
        acc.add(len(arr))
        return orig(blob, arr, num_hashes)

    try:
        bloom_mod._probe_blob = counting
        out = filter_unseen_with_bloom(
            cand, seen, bloom, num_shards=4, bits_per_shard=1 << 16
        )
        assert out.count() == 1000
    finally:
        bloom_mod._probe_blob = orig
    assert acc.value == 1500  # every candidate probed exactly once
