"""SemDeDup (embedding-cluster dedup) — deterministic keep-min-id policy."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.similarity import semdedup


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _base(i, dim=8):
    rng = np.random.RandomState(100 + i)
    v = rng.standard_normal(dim)
    return [float(x) for x in v / np.linalg.norm(v)]


def test_semdedup_drops_near_duplicates_keep_min_id(spark):
    # 4 well-separated base vectors; ids 10/11 are tiny perturbations of id 0
    rows = [(i, _base(i)) for i in range(4)]
    for dup_id in (10, 11):
        v = np.array(_base(0))
        v[0] += 0.01 * (dup_id - 9)
        v = v / np.linalg.norm(v)
        rows.append((dup_id, [float(x) for x in v]))
    out = {r["vec_id"]: r.asDict() for r in semdedup(
        _vecs(spark, rows), n_centroids=4, threshold=0.95
    ).collect()}
    assert len(out) == 6
    # originals all kept
    for i in range(4):
        assert out[i]["keep"] and out[i]["dup_of"] is None
    # both perturbed copies dropped, pointing at the smallest near-dup id
    assert not out[10]["keep"] and out[10]["dup_of"] == 0
    assert not out[11]["keep"] and out[11]["dup_of"] == 0
    assert out[10]["max_dup_cos"] >= 0.95
    assert not out[10]["cluster_overflow"]


def test_semdedup_cross_cluster_pairs_never_compared(spark):
    # identical vectors forced into different clusters by passing explicit
    # centroids equal to themselves -> each is its own cluster's seed and
    # the pair is never scored
    v = _base(1)
    rows = [(0, v), (1, v)]
    cents = _vecs(spark, rows).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    # both assign to centroid 0 (tie -> smallest cid), so they DO meet:
    out = semdedup(_vecs(spark, rows), centroids=cents, threshold=0.95).collect()
    dropped = [r for r in out if not r["keep"]]
    assert len(dropped) == 1 and dropped[0]["vec_id"] == 1


def test_semdedup_cluster_overflow_guard_keeps_members(spark):
    # 5 identical vectors in one cluster; max_cluster_size=3 -> no pairing,
    # everyone kept, overflow flagged
    v = _base(2)
    rows = [(i, v) for i in range(5)]
    out = semdedup(
        _vecs(spark, rows), n_centroids=1, threshold=0.9, max_cluster_size=3
    ).collect()
    assert all(r["keep"] for r in out)
    assert all(r["cluster_overflow"] for r in out)


def test_semdedup_respects_threshold(spark):
    # two orthogonal-ish vectors in the same cluster -> both kept
    rows = [(0, _base(3)), (1, _base(4))]
    out = semdedup(_vecs(spark, rows), n_centroids=1, threshold=0.95).collect()
    assert all(r["keep"] for r in out)


def test_semdedup_udf_path_matches_literal(spark, monkeypatch):
    from spider_spark.operators import similarity as sim

    rows = [(i, _base(i)) for i in range(6)]
    v = np.array(_base(0))
    v[0] += 0.02
    v = v / np.linalg.norm(v)
    rows.append((20, [float(x) for x in v]))
    df = _vecs(spark, rows)
    lit = sorted(
        semdedup(df, n_centroids=4, threshold=0.9).collect(),
        key=lambda r: r["vec_id"],
    )
    monkeypatch.setattr(sim, "IVF_INLINE_MAX_CENTROIDS", 0)
    udf = sorted(
        semdedup(df, n_centroids=4, threshold=0.9).collect(),
        key=lambda r: r["vec_id"],
    )
    assert [(r["vec_id"], r["cent_id"], r["keep"], r["dup_of"]) for r in lit] == [
        (r["vec_id"], r["cent_id"], r["keep"], r["dup_of"]) for r in udf
    ]
