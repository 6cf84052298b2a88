"""Host/domain reputation rollup + screen (operators/curation.py)."""

from __future__ import annotations

import pytest

from spider_spark.operators import curation


def _docs(spark):
    rows = [
        # good.test: 3 docs, all keep, scores .8/.9/1.0
        ("good.test", True, 0.8), ("good.test", True, 0.9), ("good.test", True, 1.0),
        # mixed.test: 1 of 2 keeps
        ("mixed.test", True, 0.6), ("mixed.test", False, 0.2),
        # spam.test: none keep
        ("spam.test", False, 0.1), ("spam.test", False, 0.0),
    ]
    return spark.createDataFrame(rows, ["host", "keep", "score"])


def test_reputation_rollup(spark):
    rep = {r["host"]: r for r in
           curation.host_reputation(_docs(spark), score_col="score").collect()}
    assert rep["good.test"]["n_docs"] == 3 and rep["good.test"]["keep_rate"] == 1.0
    assert rep["good.test"]["reputation"] == pytest.approx(0.9, abs=1e-6)
    assert rep["mixed.test"]["keep_rate"] == 0.5
    assert rep["mixed.test"]["reputation"] == pytest.approx(0.5 * 0.4, abs=1e-6)
    assert rep["spam.test"]["reputation"] == 0.0


def test_reputation_without_score_is_keep_rate(spark):
    rep = {r["host"]: r["reputation"]
           for r in curation.host_reputation(_docs(spark)).collect()}
    assert rep == {"good.test": 1.0, "mixed.test": 0.5, "spam.test": 0.0}


def test_screen_drops_low_hosts_keeps_unknown(spark):
    docs = _docs(spark)
    rep = curation.host_reputation(docs, score_col="score")
    extra = spark.createDataFrame([("new.test", True, 0.5)], ["host", "keep", "score"])
    screened = curation.screen_by_host_reputation(
        docs.unionByName(extra), rep, min_reputation=0.2
    )
    hosts = {r["host"] for r in screened.collect()}
    assert hosts == {"good.test", "mixed.test", "new.test"}  # spam dropped, unknown kept
    plan = screened._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
