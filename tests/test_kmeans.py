"""kmeans_lloyd (similarity.py): spherical k-means codebook training —
literal Python differential, empty-cluster retention, quantized init,
and partitioning invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import similarity as sim


def _kmeans_py(vecs_by_id, k, iters):
    """Literal restatement: cosine argmax (ties smallest cid), per-dim
    mean rounded to 6, empty cluster keeps its previous centroid."""
    ids = sorted(vecs_by_id)
    cents = {i: [round(float(x), 6) for x in vecs_by_id[ids[i]]] for i in range(k)}
    for _ in range(iters):
        members = {cid: [] for cid in cents}
        for vid in ids:
            v = vecs_by_id[vid]
            nv = math.sqrt(sum(a * a for a in v))
            best_cid, best_cos = None, None
            for cid in sorted(cents):
                c = cents[cid]
                nc = math.sqrt(sum(b * b for b in c))
                cos = (
                    sum(a * b for a, b in zip(v, c)) / (nv * nc)
                    if nv > 0 and nc > 0
                    else 0.0
                )
                if best_cos is None or cos > best_cos:
                    best_cid, best_cos = cid, cos
            members[best_cid].append(v)
        for cid, vs in members.items():
            if vs:
                dim = len(vs[0])
                cents[cid] = [
                    round(sum(v[d] for v in vs) / len(vs), 6) for d in range(dim)
                ]
    return cents


VECS = [
    (0, [1.0, 0.1]),
    (1, [0.1, 1.0]),
    (2, [2.0, 0.3]),
    (3, [0.2, 3.0]),
    (4, [4.0, 0.2]),
    (5, [0.3, 2.0]),
]


@pytest.fixture(scope="module")
def vecs_df(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


@pytest.mark.parametrize("iters", [0, 1, 2, 3])
def test_kmeans_matches_python_reference(spark, vecs_df, iters):
    got = {
        (r.cent_id, r.dim): r.value_r
        for r in sim.kmeans_lloyd(vecs_df, k=2, iters=iters).collect()
    }
    want = _kmeans_py({i: v for i, v in VECS}, 2, iters)
    assert len(got) == 2 * 2
    for cid, cv in want.items():
        for d, val in enumerate(cv):
            assert got[(cid, d)] == pytest.approx(val, abs=2e-6), (cid, d)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # third init vector points opposite everything -> never assigned after
    # the first sweep's mean pull; its centroid must persist verbatim
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [-1.0, -1.0]),
        (3, [1.0, 0.05]),
        (4, [0.05, 1.0]),
        (5, [0.9, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        (r.cent_id, r.dim): r.value_r
        for r in sim.kmeans_lloyd(df, k=3, iters=2).collect()
    }
    want = _kmeans_py({i: v for i, v in rows}, 3, iters=2)
    for cid, cv in want.items():
        for d, val in enumerate(cv):
            assert out[(cid, d)] == pytest.approx(val, abs=2e-6), (cid, d)


def test_kmeans_separates_obvious_clusters(spark, vecs_df):
    cents = sim.kmeans_lloyd(vecs_df, k=2, iters=3).collect()
    c = {}
    for r in cents:
        c.setdefault(r.cent_id, {})[r.dim] = r.value_r
    # cluster 0 seeded on the x-heavy vector, 1 on the y-heavy one
    assert c[0][0] > c[0][1]
    assert c[1][1] > c[1][0]


def test_kmeans_partitioning_invariant(spark, vecs_df):
    a = sorted(
        (r.cent_id, r.dim, r.value_r)
        for r in sim.kmeans_lloyd(vecs_df.repartition(7), k=2, iters=2).collect()
    )
    b = sorted(
        (r.cent_id, r.dim, r.value_r)
        for r in sim.kmeans_lloyd(vecs_df.coalesce(1), k=2, iters=2).collect()
    )
    assert a == b


def test_kmeans_validates_inputs(spark, vecs_df):
    with pytest.raises(ValueError):
        sim.kmeans_lloyd(vecs_df, k=0)
    with pytest.raises(ValueError):
        sim.kmeans_lloyd(vecs_df, k=100)
