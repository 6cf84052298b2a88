"""Rocchio PRF two-pass retrieval (index.bm25_search_prf)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import index as ix

# 'incident' co-occurs with 'outage' in the relevant cluster; doc 5 never
# mentions 'incident' but is outage-heavy — only the expanded query finds it
DOCS = [
    (0, "incident outage outage outage"),
    (1, "incident outage outage notes"),
    (2, "incident outage timeline"),
    (3, "weather report sunny day"),
    (4, "cooking recipe dinner"),
    (5, "outage outage outage root cause"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_prf_expansion_recalls_the_unqueried_doc(spark, docs):
    plain = {r["doc_id"] for r in ix.bm25_search(docs, "incident", k=10).collect()}
    assert 5 not in plain  # no query term → invisible to pass 1
    prf = {
        r["doc_id"]
        for r in ix.bm25_search_prf(
            docs, "incident", k=10, k_fb=3, n_expand=3
        ).collect()
    }
    assert 5 in prf  # 'outage' harvested from the feedback set finds it
    assert {0, 1, 2} <= prf


def test_prf_literal_scoring(spark, docs):
    """With beta and the expansion set pinned, the rescoring is Σ w·bm25_r
    — check one doc against the per-(doc,term) table."""
    beta = 0.4
    scores = {
        (r["doc_id"], r["term"]): r["bm25_r"]
        for r in ix.bm25_scores(docs).collect()
    }
    # feedback top-3 for 'incident' = docs 0,1,2 (the only matches)
    fb = [0, 1, 2]
    from collections import defaultdict

    strength = defaultdict(float)
    for (d, t), v in scores.items():
        if d in fb and t != "incident":
            strength[t] += v
    expansion = sorted(strength, key=lambda t: (-round(strength[t], 6), t))[:3]
    got = {
        r["doc_id"]: r["score_r"]
        for r in ix.bm25_search_prf(
            docs, "incident", k=10, k_fb=3, n_expand=3, beta=beta
        ).collect()
    }
    for d in got:
        want = scores.get((d, "incident"), 0.0) + beta * sum(
            scores.get((d, t), 0.0) for t in expansion
        )
        assert got[d] == pytest.approx(want, abs=5e-6), d


def test_prf_zero_expansion_equals_plain_bm25(spark, docs):
    prf = ix.bm25_search_prf(docs, "incident outage", k=5, n_expand=0).collect()
    plain = ix.bm25_search(docs, "incident outage", k=5).collect()
    assert [(r["doc_id"], r["score_r"]) for r in prf] == [
        (r["doc_id"], r["score_r"]) for r in plain
    ]


def test_prf_validation(spark, docs):
    with pytest.raises(ValueError):
        ix.bm25_search_prf(docs, "x", k_fb=0)
    with pytest.raises(ValueError):
        ix.bm25_search_prf(docs, "x", beta=-1)
    with pytest.raises(ValueError):
        ix.bm25_search_prf(docs, "!!!")
