"""Leakage-safe cluster splits (curation.leakage_safe_splits)."""

from __future__ import annotations

import hashlib

from spider_spark.operators import curation as cu


def _bucket(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16) % 100


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_cluster_ids(spark):
    rows = [
        (0, "alpha"), (1, "beta"), (2, "alpha"), (3, None),
        (4, ""), (5, "beta"), (6, "gamma"),
    ]
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in cu.exact_dup_cluster_ids(_docs(spark, rows)).collect()
    }
    # null and empty text share the coalesce('') fingerprint
    assert got == {0: 0, 1: 1, 2: 0, 3: 3, 4: 3, 5: 1, 6: 6}


def test_duplicates_never_straddle_splits(spark):
    # 50 clusters x 4 copies; every copy must land in its cluster's split
    rows = [
        (100 * c + i, f"text of cluster {c}")
        for c in range(50)
        for i in range(4)
    ]
    out = cu.leakage_safe_splits(
        cu.exact_dup_cluster_ids(_docs(spark, rows)),
        "cluster_id",
        val_pct=20,
        test_pct=20,
    ).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # and with per-DOC hashing at least one 4-copy cluster would straddle
    naive = {}
    for r in out:
        b = _bucket(r["doc_id"])
        s = "test" if b < 20 else ("val" if b < 40 else "train")
        naive.setdefault(r["cluster_id"], set()).add(s)
    assert any(len(s) > 1 for s in naive.values())


def test_split_matches_md5_bucket_of_cluster(spark):
    rows = [(i, f"t{i % 7}") for i in range(30)]
    out = cu.leakage_safe_splits(
        cu.exact_dup_cluster_ids(_docs(spark, rows)),
        "cluster_id",
        val_pct=5,
        test_pct=5,
    ).collect()
    for r in out:
        b = _bucket(r["cluster_id"])
        want = "test" if b < 5 else ("val" if b < 10 else "train")
        assert (r["bucket"], r["split"]) == (b, want)
