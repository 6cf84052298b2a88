"""Dirichlet query-likelihood ranking (index.ql_dirichlet_search) and
revisit-value ordering (recrawl.revisit_priority)."""

from __future__ import annotations

import math
import re

import pandas as pd
import pytest

from spider_spark.operators import index as ix
from spider_spark.operators import recrawl

DOCS = [
    (0, "spark window spark merge"),
    (1, "window functions guide"),
    (2, "spark tuning"),
    (3, "cooking recipes only"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def _brute_ql(query, mu):
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in DOCS}
    terms = sorted(set(re.findall(r"[a-z0-9]+", query.lower())))
    ctot = sum(len(v) for v in toks.values())
    cf = {
        t: sum(v.count(t) for v in toks.values())
        for t in terms
        if any(t in v for v in toks.values())
    }
    out = {}
    for d, v in toks.items():
        if not any(t in v for t in cf):
            continue
        s = 0.0
        for t, c in cf.items():
            ptc = c / ctot
            s += math.log((v.count(t) + mu * ptc) / (len(v) + mu))
        out[d] = round(s, 6)
    return out


def test_ql_matches_literal_formula(spark, docs):
    for query, mu in [("spark window", 100.0), ("spark", 2000.0), ("guide unknownterm", 50.0)]:
        got = {
            r["doc_id"]: r["score_r"]
            for r in ix.ql_dirichlet_search(docs, query, k=10, mu=mu).collect()
        }
        want = _brute_ql(query, mu)
        assert set(got) == set(want), query
        for d in want:
            assert got[d] == pytest.approx(want[d], abs=2e-6), (query, d)


def test_ql_ranking_and_validation(spark, docs):
    ranked = ix.ql_dirichlet_search(docs, "spark window", k=10, mu=100.0).collect()
    assert ranked[0]["doc_id"] == 0  # has both terms, twice-over spark
    assert [r["rank"] for r in ranked] == list(range(1, len(ranked) + 1))
    assert 3 not in {r["doc_id"] for r in ranked}  # matches nothing
    with pytest.raises(ValueError):
        ix.ql_dirichlet_search(docs, "!!!")
    with pytest.raises(ValueError):
        ix.ql_dirichlet_search(docs, "spark", mu=0)
    # every term unknown to the collection → empty frame (documented)
    assert ix.ql_dirichlet_search(docs, "zzz qqq").collect() == []


def test_revisit_priority_arithmetic(spark):
    fresh = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["hot-stale", "hot-fresh", "cold-stale", "newcomer"],
                "freshness_r": [0.2, 0.99, 0.2, None],
            }
        )
    )
    ranks = spark.createDataFrame(
        pd.DataFrame(
            {"url": ["hot-stale", "hot-fresh", "cold-stale"], "rank": [5.0, 5.0, 0.5]}
        )
    )
    got = {r["url"]: r for r in recrawl.revisit_priority(fresh, ranks).collect()}
    assert got["hot-stale"]["revisit_r"] == pytest.approx(5.0 * 0.8, abs=1e-6)
    assert got["hot-fresh"]["revisit_r"] == pytest.approx(5.0 * 0.01, abs=1e-6)
    assert got["cold-stale"]["revisit_r"] == pytest.approx(0.5 * 0.8, abs=1e-6)
    # unknown freshness = fully stale; unknown rank = 1.0 floor
    assert got["newcomer"]["staleness_r"] == 1.0
    assert got["newcomer"]["rank"] == 1.0 and got["newcomer"]["revisit_r"] == 1.0
    # the ordering the objective wants: important-and-stale first
    order = sorted(got.values(), key=lambda r: -r["revisit_r"])
    assert order[0]["url"] == "hot-stale"
    assert order[-1]["url"] == "hot-fresh"


def test_revisit_priority_without_ranks(spark):
    fresh = spark.createDataFrame(
        pd.DataFrame({"url": ["a", "b"], "freshness_r": [0.5, 0.25]})
    )
    got = {r["url"]: r["revisit_r"] for r in recrawl.revisit_priority(fresh).collect()}
    assert got == {"a": 0.5, "b": 0.75}
