"""Prototype-based data pruning (Sorscher et al. 2022): difficulty =
cosine to the assigned cluster prototype; keep a per-cluster fraction of
the hardest (or easiest) examples. Differential-tested against a pure
numpy reimplementation, and the literal-codegen vs numpy-UDF assignment
paths are pinned equal."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import similarity as sim

VEC_SCHEMA = "vec_id bigint, embedding array<float>"


def _vecs(n=40, dim=6, seed=7):
    rng = np.random.RandomState(seed)
    return [(i, rng.randn(dim).astype(float).tolist()) for i in range(n)]


def _brute(rows, n_centroids, keep_fraction, policy):
    ids = [i for i, _ in rows]
    # the Spark column is array<float>: quantize through float32 first
    m = np.array([v for _, v in rows], dtype=np.float32).astype(np.float64)
    cents = m[: n_centroids]
    cids = ids[:n_centroids]

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0

    assign, pcos = {}, {}
    for i, v in zip(ids, m):
        scored = sorted(
            ((cos(v, c), -cid) for c, cid in zip(cents, cids)), reverse=True
        )
        assign[i] = -scored[0][1]
        pcos[i] = scored[0][0]
    out = {}
    for cid in set(assign.values()):
        members = [i for i in ids if assign[i] == cid]
        key = (lambda i: (pcos[i], i)) if policy == "hard" else (lambda i: (-pcos[i], i))
        ranked = sorted(members, key=key)
        quota = math.ceil(keep_fraction * len(members))
        for r, i in enumerate(ranked, 1):
            out[i] = (cid, pcos[i], len(members), r, r <= quota)
    return out


@pytest.mark.parametrize("policy", ["hard", "easy"])
def test_matches_brute_force(spark, policy):
    rows = _vecs()
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    got = {
        r.vec_id: (r.cent_id, r.proto_cos, r.cluster_size, r.rank_in_cluster, r.keep)
        for r in sim.prototype_pruning(
            df, n_centroids=5, keep_fraction=0.4, policy=policy
        ).collect()
    }
    want = _brute(rows, 5, 0.4, policy)
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-9)
        assert got[i][2:] == want[i][2:], i


def test_literal_and_udf_paths_agree(spark, monkeypatch):
    rows = _vecs(n=30)
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    lit = sorted(
        sim.prototype_pruning(df, n_centroids=4, keep_fraction=0.5).collect()
    )
    monkeypatch.setattr(sim, "IVF_INLINE_MAX_CENTROIDS", 0)
    udf = sorted(
        sim.prototype_pruning(df, n_centroids=4, keep_fraction=0.5).collect()
    )
    assert [r.vec_id for r in lit] == [r.vec_id for r in udf]
    for a, b in zip(lit, udf):
        assert (a.cent_id, a.cluster_size, a.rank_in_cluster, a.keep) == (
            b.cent_id,
            b.cluster_size,
            b.rank_in_cluster,
            b.keep,
        )
        assert a.proto_cos == pytest.approx(b.proto_cos, abs=1e-12)


def test_every_cluster_keeps_its_quota(spark):
    df = spark.createDataFrame(_vecs(n=50), VEC_SCHEMA)
    out = sim.prototype_pruning(df, n_centroids=6, keep_fraction=0.3).collect()
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r.cent_id, []).append(r)
    for cid, members in by_cluster.items():
        kept = sum(1 for r in members if r.keep)
        assert kept == math.ceil(0.3 * len(members)), cid
        assert kept >= 1  # coverage: no cluster is emptied


def test_hard_keeps_low_cos_easy_keeps_high(spark):
    df = spark.createDataFrame(_vecs(n=30), VEC_SCHEMA)
    hard = sim.prototype_pruning(df, n_centroids=3, keep_fraction=0.5, policy="hard")
    easy = sim.prototype_pruning(df, n_centroids=3, keep_fraction=0.5, policy="easy")
    h = hard.collect()
    for cid in {r.cent_id for r in h}:
        members = [r for r in h if r.cent_id == cid]
        kept = [r.proto_cos for r in members if r.keep]
        dropped = [r.proto_cos for r in members if not r.keep]
        if kept and dropped:
            assert max(kept) <= min(dropped) + 1e-12
    e = easy.collect()
    for cid in {r.cent_id for r in e}:
        members = [r for r in e if r.cent_id == cid]
        kept = [r.proto_cos for r in members if r.keep]
        dropped = [r.proto_cos for r in members if not r.keep]
        if kept and dropped:
            assert min(kept) >= max(dropped) - 1e-12


def test_zero_norm_vector_scores_zero(spark):
    rows = _vecs(n=10) + [(99, [0.0] * 6)]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    out = {r.vec_id: r for r in sim.prototype_pruning(df, n_centroids=3).collect()}
    assert out[99].proto_cos == 0.0


def test_bad_policy_raises(spark):
    df = spark.createDataFrame(_vecs(n=5), VEC_SCHEMA)
    with pytest.raises(ValueError):
        sim.prototype_pruning(df, policy="random")
