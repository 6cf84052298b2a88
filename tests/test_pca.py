"""PCA over embeddings (similarity.pca_fit / pca_project) vs numpy."""

from __future__ import annotations

import numpy as np
import pytest

from spider_spark.operators import similarity as sim


def _vecs(rng, n=120, d=12):
    # anisotropic cloud: variance concentrated in a few directions
    basis = rng.standard_normal((d, d))
    scales = np.array([10, 6, 3] + [0.5] * (d - 3))
    return rng.standard_normal((n, d)) * scales @ basis * 0.1


def _df(spark, x):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )


def test_fit_matches_numpy(spark):
    rng = np.random.default_rng(11)
    x = _vecs(rng)
    model = sim.pca_fit(_df(spark, x), k=4)
    mean = x.mean(0)
    cov = (x - mean).T @ (x - mean) / x.shape[0]
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:4]
    assert np.allclose(model["mean"], mean, atol=1e-9)
    for ci, idx in enumerate(order):
        v = vecs[:, idx]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        assert np.allclose(model["components"][ci], v, atol=1e-8), ci
        assert abs(model["explained_var"][ci] - vals[idx]) < 1e-8
    # descending variance, ratios in (0, 1]
    ev = model["explained_var"]
    assert ev == sorted(ev, reverse=True)
    assert all(0 < r <= 1 for r in model["explained_ratio"])


def test_project_matches_numpy_and_partitioning(spark):
    rng = np.random.default_rng(5)
    x = _vecs(rng, n=80)
    df = _df(spark, x)
    model = sim.pca_fit(df, k=3)
    want = np.round(
        (x - np.array(model["mean"])) @ np.array(model["components"]).T, 6
    )
    for parts in (1, 7):
        got = {
            r["id"]: r["pca"]
            for r in sim.pca_project(df.repartition(parts), model).collect()
        }
        for i in range(x.shape[0]):
            assert np.allclose(got[i], want[i], atol=1e-9)


def test_fit_partitioning_invariance(spark):
    rng = np.random.default_rng(3)
    x = _vecs(rng, n=60)
    m1 = sim.pca_fit(_df(spark, x).repartition(1), k=2)
    m8 = sim.pca_fit(_df(spark, x).repartition(8), k=2)
    assert np.allclose(m1["components"], m8["components"], atol=1e-9)
    assert np.allclose(m1["explained_var"], m8["explained_var"], atol=1e-9)


def test_validation(spark):
    df = _df(spark, np.zeros((3, 4)))
    with pytest.raises(ValueError):
        sim.pca_fit(df, k=0)
    with pytest.raises(ValueError):
        sim.pca_fit(df, k=5)
    with pytest.raises(ValueError):
        sim.pca_fit(df.limit(0), k=1)
