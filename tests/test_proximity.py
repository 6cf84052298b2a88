"""Term proximity (index.term_proximity) and TextRank keywords
(textqc.textrank_keywords) — literal-arithmetic differentials."""

from __future__ import annotations

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import index as ix
from spider_spark.operators import textqc


DOCS = [
    (0, "spark window functions and spark shuffles"),
    (1, "window first then much later spark"),
    (2, "spark only here"),
    (3, "nothing relevant at all"),
    (4, "window spark window spark"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_proximity_literals(spark, docs):
    got = {
        r["doc_id"]: r
        for r in ix.term_proximity(docs, "spark window").collect()
    }
    # doc 0: spark@0,4 window@1 → min |0-1|=1 → prox 1.0
    assert got[0]["min_pair_dist"] == 1 and got[0]["prox_r"] == 1.0
    # doc 1: window@0 spark@5 → dist 5 → prox 0.2
    assert got[1]["min_pair_dist"] == 5 and got[1]["prox_r"] == 0.2
    # doc 2: one term only → prox 0, null dist
    assert got[2]["n_terms_present"] == 1
    assert got[2]["min_pair_dist"] is None and got[2]["prox_r"] == 0.0
    # doc 3 matches nothing → absent
    assert 3 not in got
    # doc 4: adjacent repeatedly → min 1
    assert got[4]["min_pair_dist"] == 1
    with pytest.raises(ValueError):
        ix.term_proximity(docs, "???")


def test_proximity_three_terms_sums_pairs(spark):
    df = spark.createDataFrame(
        pd.DataFrame([(0, "a x b y c")], columns=["doc_id", "text"])
    )
    r = ix.term_proximity(df, "a b c").collect()[0]
    # pairs: (a,b)=2, (a,c)=4, (b,c)=2 → prox = 1/2 + 1/4 + 1/2
    assert r["n_terms_present"] == 3
    assert r["min_pair_dist"] == 2
    assert r["prox_r"] == round(0.5 + 0.25 + 0.5, 6)


def _brute_textrank(texts, iters=2, d=0.85, min_len=2):
    from collections import defaultdict

    w = defaultdict(float)
    for t in texts:
        toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if len(x) >= min_len]
        for a, b in zip(toks, toks[1:]):
            if a != b:
                w[(a, b)] += 1.0
    edges = defaultdict(float)
    for (a, b), c in w.items():
        edges[(a, b)] += c
        edges[(b, a)] += c
    nodes = {n for e in edges for n in e}
    wout = defaultdict(float)
    for (a, b), c in edges.items():
        wout[a] += c
    rank = {n: 1.0 for n in nodes}
    for _ in range(iters):
        in_sum = defaultdict(float)
        for (a, b), c in edges.items():
            in_sum[b] += rank[a] * c / wout[a]
        rank = {n: (1 - d) + d * in_sum.get(n, 0.0) for n in nodes}
    return {n: round(r, 6) for n, r in rank.items()}


def test_textrank_matches_bruteforce(spark):
    texts = [
        "graph ranking with graph walks",
        "ranking pages by walks over the link graph",
        "walks and ranking and graph",
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = {
        r["term"]: r["rank_r"]
        for r in textqc.textrank_keywords(df, iters=2).collect()
    }
    want = _brute_textrank(texts, iters=2)
    assert set(got) == set(want)
    for t in want:  # float sum order differs between engines by ≤1 ulp
        assert got[t] == pytest.approx(want[t], abs=2e-6), t


def test_textrank_bridge_beats_phrase_repetition(spark):
    # 'hub' bridges distinct contexts; 'boiler plate' repeats as one phrase
    texts = [
        "hub alpha", "hub beta", "hub gamma", "hub delta",
        "boiler plate", "boiler plate", "boiler plate", "boiler plate",
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = {
        r["term"]: r["rank_r"] for r in textqc.textrank_keywords(df).collect()
    }
    assert got["hub"] > got["boiler"]
    with pytest.raises(ValueError):
        textqc.textrank_keywords(df, min_len=0)
