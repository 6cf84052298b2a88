"""Spam mass (graph.spam_mass), RRF (index.reciprocal_rank_fusion), and
UCB host scheduling (adaptive.ucb_host_priority) — literal arithmetic and
the published invariants."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import adaptive, graph
from spider_spark.operators import index as ix


def test_spam_mass_flags_the_link_farm(spark):
    # trusted community t0->t1->t2 (t0 seeded); spam farm s1..s4 all
    # linking to 'target' which has no trusted in-links
    edges = spark.createDataFrame(
        pd.DataFrame(
            [
                ("t0", "t1"), ("t1", "t2"), ("t2", "t0"),
                ("s1", "target"), ("s2", "target"),
                ("s3", "target"), ("s4", "target"),
            ],
            columns=["src", "dst"],
        )
    )
    seeds = spark.createDataFrame(pd.DataFrame({"node": ["t0"]}))
    out = {r["node"]: r for r in graph.spam_mass(edges, seeds, iters=2).collect()}
    # the farm target's rank is entirely untrusted: rel_mass ≈ 1
    assert out["target"]["rel_mass_r"] == pytest.approx(1.0, abs=1e-6)
    # the seed's successor earns most rank through the trusted chain
    assert out["t1"]["rel_mass_r"] < out["target"]["rel_mass_r"]
    # mass = pr - core everywhere (rounding-consistent)
    for r in out.values():
        assert r["mass_r"] == pytest.approx(r["pr_r"] - r["core_r"], abs=2e-6)


def test_spam_mass_core_scaling(spark):
    """With ALL nodes seeded and symmetric structure, n·trust == pr ⇒
    mass ≈ 0 — the normalization contract."""
    edges = spark.createDataFrame(
        pd.DataFrame([("a", "b"), ("b", "c"), ("c", "a")], columns=["src", "dst"])
    )
    seeds = spark.createDataFrame(pd.DataFrame({"node": ["a", "b", "c"]}))
    for r in graph.spam_mass(edges, seeds, iters=3).collect():
        assert r["mass_r"] == pytest.approx(0.0, abs=1e-6)
        assert r["rel_mass_r"] == pytest.approx(0.0, abs=1e-6)


def test_rrf_literal_and_absentees(spark):
    r1 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "rank": [1, 2, 3]})
    )
    r2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [3, 1], "rank": [1, 2]})
    )
    got = {
        r["doc_id"]: (r["n_lists"], r["rrf_r"])
        for r in ix.reciprocal_rank_fusion([r1, r2], k=60).collect()
    }
    assert got[1] == (2, round(1 / 61 + 1 / 62, 6))
    assert got[2] == (1, round(1 / 62, 6))
    assert got[3] == (2, round(1 / 63 + 1 / 61, 6))
    # consensus doc 3 (top of one list, 3rd of other) beats solo doc 2
    assert got[3][1] > got[2][1]
    with pytest.raises(ValueError):
        ix.reciprocal_rank_fusion([], k=60)
    with pytest.raises(ValueError):
        ix.reciprocal_rank_fusion([r1], k=0)


def test_ucb_host_priority_arithmetic(spark):
    hy = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["rich", "thin", "fresh"],
                "n_fetches": [90, 10, 0],
                "yield_sum": [450.0, 80.0, 0.0],
            }
        )
    )
    got = {r["host"]: r for r in adaptive.ucb_host_priority(hy).collect()}
    N = 100.0
    c = math.sqrt(2)
    assert got["rich"]["mean_yield_r"] == 5.0
    assert got["rich"]["ucb_r"] == round(5.0 + c * math.sqrt(math.log(N) / 90), 6)
    assert got["thin"]["ucb_r"] == round(8.0 + c * math.sqrt(math.log(N) / 10), 6)
    # thin host's higher mean + bigger bonus outranks the rich host
    assert got["thin"]["ucb_r"] > got["rich"]["ucb_r"]
    # never-fetched host: explore flag, null scores
    assert got["fresh"]["explore"] is True
    assert got["fresh"]["ucb_r"] is None
    assert got["rich"]["explore"] is False
    with pytest.raises(ValueError):
        adaptive.ucb_host_priority(hy, c=-1)


def test_ucb_exploration_shrinks_with_evidence(spark):
    # same mean yield; the host with less evidence gets the larger bonus
    hy = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["a", "b"],
                "n_fetches": [4, 64],
                "yield_sum": [8.0, 128.0],
            }
        )
    )
    got = {r["host"]: r for r in adaptive.ucb_host_priority(hy).collect()}
    assert got["a"]["mean_yield_r"] == got["b"]["mean_yield_r"] == 2.0
    assert got["a"]["ucb_r"] > got["b"]["ucb_r"]
