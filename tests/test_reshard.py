"""Reshard movement stats (layout.reshard_move_stats)."""

from __future__ import annotations

import hashlib

import pytest

from spider_spark.operators import layout as ly


def _h(key, shard):
    return int(
        hashlib.md5(f"{key}:{shard}".encode()).hexdigest()[:8], 16
    )


def _hrw(key, shards):
    return max(shards, key=lambda s: (_h(key, s), s))


def _bucket(key):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % 1_000_003


def _keys_df(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


BEFORE = ["s-a", "s-b", "s-c"]
AFTER = ["s-a", "s-b", "s-c", "s-d"]


def test_matches_brute_force(spark):
    n = 400
    got = ly.reshard_move_stats(_keys_df(spark, n), BEFORE, AFTER).collect()[0]
    mod_moved = sum(
        1 for k in range(n)
        if _bucket(k) % len(BEFORE) != _bucket(k) % len(AFTER)
    )
    hrw_pairs = [(_hrw(k, BEFORE), _hrw(k, AFTER)) for k in range(n)]
    hrw_moved = sum(1 for b, a in hrw_pairs if b != a)
    to_new = sum(1 for b, a in hrw_pairs if b != a and a == "s-d")
    assert got["n_keys"] == n
    assert got["mod_moved_r"] == round(mod_moved / n, 6)
    assert got["hrw_moved_r"] == round(hrw_moved / n, 6)
    assert got["hrw_moved_to_new_r"] == round(to_new / hrw_moved, 6)


def test_consistent_hashing_property(spark):
    row = ly.reshard_move_stats(
        _keys_df(spark, 2000), BEFORE, AFTER
    ).collect()[0]
    # every HRW-moved key lands ON the new shard
    assert row["hrw_moved_to_new_r"] == 1.0
    # HRW moves ~ the new shard's fair share (1/4), mod moves most keys
    assert 0.15 < row["hrw_moved_r"] < 0.35
    assert row["mod_moved_r"] > 2 * row["hrw_moved_r"]


def test_no_change_no_movement_and_validation(spark):
    row = ly.reshard_move_stats(
        _keys_df(spark, 50), BEFORE, list(BEFORE)
    ).collect()[0]
    assert row["hrw_moved_r"] == 0.0 and row["mod_moved_r"] == 0.0
    assert row["hrw_moved_to_new_r"] is None  # no moved keys
    with pytest.raises(ValueError):
        ly.reshard_move_stats(_keys_df(spark, 5), [], AFTER)
