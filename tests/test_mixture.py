"""Token-budget mixture planner + deterministic materializer."""

import pytest
from pyspark.sql import functions as F

from spider_spark.operators.curation import (
    materialize_mixture,
    token_budget_mixture,
)


def _docs(spark):
    # src a: 4 docs x 100 tokens; src b: 2 docs x 50; src c: 1 doc x 1000
    rows = (
        [(i, "a", 100) for i in range(4)]
        + [(10 + i, "b", 50) for i in range(2)]
        + [(20, "c", 1000)]
    )
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")


def test_mixture_plan_rates_and_caps(spark):
    plan = {
        r["source"]: r.asDict()
        for r in token_budget_mixture(
            _docs(spark), {"a": 1.0, "b": 1.0}, budget_tokens=400
        ).collect()
    }
    # a: target 200 of 400 available -> rate 0.5
    assert plan["a"]["tokens_available"] == 400
    assert plan["a"]["target_tokens"] == 200.0
    assert plan["a"]["sample_rate"] == pytest.approx(0.5)
    assert not plan["a"]["capped"]
    assert plan["a"]["planned_tokens"] == 200
    # b: target 200 of 100 available -> capped at 1 epoch
    assert plan["b"]["capped"] and plan["b"]["sample_rate"] == 1.0
    assert plan["b"]["planned_tokens"] == 100
    # c: no weight -> rate 0
    assert plan["c"]["sample_rate"] == 0.0 and plan["c"]["planned_tokens"] == 0


def test_mixture_upsampling_epochs(spark):
    plan = token_budget_mixture(
        _docs(spark), {"b": 1.0}, budget_tokens=250, max_epochs=4.0
    )
    row = plan.filter(F.col("source") == "b").collect()[0]
    assert row["sample_rate"] == pytest.approx(2.5)
    out = materialize_mixture(_docs(spark), plan)
    rows = out.filter(F.col("source") == "b").collect()
    # every b doc appears at epochs 0 and 1 (full), epoch 2 fractional
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["epoch"])
    for d, eps in by_doc.items():
        assert {0, 1} <= eps <= {0, 1, 2}
    # unweighted sources never appear
    assert out.filter(F.col("source") != "b").count() == 0


def test_materialize_is_rerun_stable(spark):
    docs = _docs(spark)
    plan = token_budget_mixture(docs, {"a": 3.0, "b": 1.0}, budget_tokens=300)
    a = sorted(
        (r["doc_id"], r["epoch"]) for r in materialize_mixture(docs, plan).collect()
    )
    b = sorted(
        (r["doc_id"], r["epoch"]) for r in materialize_mixture(docs, plan).collect()
    )
    assert a == b and len(a) > 0


def test_mixture_validates_inputs(spark):
    with pytest.raises(ValueError):
        token_budget_mixture(_docs(spark), {}, budget_tokens=100)
    with pytest.raises(ValueError):
        token_budget_mixture(_docs(spark), {"a": 1.0}, budget_tokens=-1)
