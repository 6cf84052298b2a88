"""Measured size gates and plan-size guards (VERDICT r02 wrong #3/#4):
decontaminate/doc_cross_entropy broadcast only under a counted gate, and
ivf_topk abandons SQL-literal centroid inlining above the plan-size cliff
for an equivalent map-only pandas-UDF assignment."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import curation, lm as lmod, similarity


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_auto_broadcast(spark):
    """Disable size-estimated auto-broadcast so the physical plan reflects
    ONLY the operator's explicit broadcast decision."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    if old_aqe is not None:
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def _docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "alpha beta gamma delta",
                    "beta gamma delta epsilon",
                    "zeta eta theta iota",
                ],
            }
        )
    )


def _bench(spark):
    return spark.createDataFrame(
        pd.DataFrame({"text": ["alpha beta gamma delta epsilon kappa"]})
    )


def test_decontaminate_gate_both_sides(spark, no_auto_broadcast, monkeypatch):
    docs, grams = _docs(spark), curation.benchmark_ngrams(_bench(spark), n=3)
    # under the gate → broadcast hash join on the gram side
    under = curation.decontaminate(docs, grams, n=3)
    assert "BroadcastHashJoin" in _physical(under)
    # above the gate (shrunk to 1 row) → the probe counts past it and the
    # planner shuffle-joins instead
    monkeypatch.setattr(curation, "BENCH_BROADCAST_ROWS", 1)
    over = curation.decontaminate(docs, grams, n=3)
    assert "BroadcastHashJoin" not in _physical(over)
    assert sorted(map(tuple, under.collect())) == sorted(map(tuple, over.collect()))


def test_doc_cross_entropy_gate_both_sides(spark, no_auto_broadcast, monkeypatch):
    docs = _docs(spark)
    model = lmod.unigram_lm(docs)
    # The gate governs the VOCAB join (key: token). The model plan also
    # carries unigram_lm's intentional 1-row totals broadcast (keyed on
    # __scalar_key), so assert on the token-keyed join specifically.
    under = lmod.doc_cross_entropy(docs, model)
    assert "BroadcastHashJoin [token" in _physical(under)
    monkeypatch.setattr(lmod, "LM_BROADCAST_ROWS", 1)
    over = lmod.doc_cross_entropy(docs, model)
    assert "BroadcastHashJoin [token" not in _physical(over)
    u = {r.doc_id: round(r.ce_nats, 10) for r in under.collect()}
    o = {r.doc_id: round(r.ce_nats, 10) for r in over.collect()}
    assert u == o


def _emb(spark, n=40, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    vecs = rng.standard_normal((n, dim)).astype("float32")
    return spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": [v.tolist() for v in vecs]})
    )


def test_ivf_pandas_path_matches_literal_path(spark, monkeypatch):
    """Above IVF_INLINE_MAX_CENTROIDS the numpy-closure assignment must
    produce the exact same top-k as the SQL-literal path (same cosine,
    same smallest-id tie-break) — the r02 #4 'enforce the contract' fix."""
    corpus = _emb(spark, 40)
    probes = (
        _emb(spark, 3, seed=11)
        .select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec"))
    )
    lit_out = sorted(
        map(tuple, similarity.ivf_topk(corpus, probes, k=5, n_centroids=8, n_probe=8).collect())
    )
    monkeypatch.setattr(similarity, "IVF_INLINE_MAX_CENTROIDS", 2)
    udf_out = sorted(
        map(tuple, similarity.ivf_topk(corpus, probes, k=5, n_centroids=8, n_probe=8).collect())
    )
    assert [(a, b, round(c, 8), d) for a, b, c, d in lit_out] == [
        (a, b, round(c, 8), d) for a, b, c, d in udf_out
    ]


def test_ivf_refuses_absurd_codebooks(spark, monkeypatch):
    corpus = _emb(spark, 10)
    probes = corpus.limit(1).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    monkeypatch.setattr(similarity, "IVF_MAX_CENTROIDS", 4)
    with pytest.raises(ValueError, match="IVF_MAX_CENTROIDS"):
        similarity.ivf_topk(corpus, probes, k=2, n_centroids=8)
