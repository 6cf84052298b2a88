"""Crawl-ordering quality (operators/ordering.py) and expected freshness
(recrawl.expected_freshness) — both checked against literal arithmetic."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import ordering as od
from spider_spark.operators import recrawl


def _ledger(spark):
    # two orderings over the same 12 urls/4 ticks; 'greedy' fetches the
    # high-value urls first, 'bfs' is value-blind
    rows = []
    vals = {f"u{i}": float(i) for i in range(12)}  # value = index
    for i in range(12):
        rows.append(("bfs", f"u{i}", i // 3))  # u0..u2 tick0, ...
        rows.append(("greedy", f"u{i}", (11 - i) // 3))  # high value first
    led = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ordering", "url", "tick"])
    )
    values = spark.createDataFrame(
        pd.DataFrame(list(vals.items()), columns=["url", "value"])
    )
    return led, values, vals


def test_order_quality_curve_arithmetic(spark):
    led, values, vals = _ledger(spark)
    curve = od.crawl_order_quality(led, values, ordering_col="ordering")
    got = {
        (r["ordering"], r["tick"]): (
            r["n_fetched"],
            r["cum_fetched"],
            r["cum_value_r"],
            r["cum_value_frac_r"],
        )
        for r in curve.collect()
    }
    total = sum(vals.values())  # 66
    # bfs tick0 = u0,u1,u2 → 3; greedy tick0 = u9,u10,u11 → 30
    assert got[("bfs", 0)] == (3, 3, 3.0, round(3 / total, 6))
    assert got[("greedy", 0)] == (3, 3, 30.0, round(30 / total, 6))
    assert got[("bfs", 3)][3] == 1.0 and got[("greedy", 3)][3] == 1.0
    # greedy's curve dominates bfs at every interior tick
    for t in (0, 1, 2):
        assert got[("greedy", t)][3] > got[("bfs", t)][3]


def test_order_quality_missing_values_count_zero(spark):
    led = spark.createDataFrame(
        pd.DataFrame(
            [("u0", 0), ("ghost", 0), ("u1", 1)], columns=["url", "tick"]
        )
    )
    values = spark.createDataFrame(
        pd.DataFrame([("u0", 4.0), ("u1", 6.0)], columns=["url", "value"])
    )
    got = {r["tick"]: r for r in od.crawl_order_quality(led, values).collect()}
    assert got[0]["n_fetched"] == 2 and got[0]["cum_value_r"] == 4.0
    assert got[1]["cum_value_frac_r"] == 1.0


def test_ordering_auc_ranks_greedy_first(spark):
    led, values, _ = _ledger(spark)
    curve = od.crawl_order_quality(led, values, ordering_col="ordering")
    auc = {r["ordering"]: r["auc_r"] for r in od.ordering_auc(curve, ordering_col="ordering").collect()}
    assert auc["greedy"] > auc["bfs"]
    # literal check: bfs fracs = 3/66, 15/66, 36/66, 1 → mean
    want_bfs = round(
        (round(3 / 66, 6) + round(15 / 66, 6) + round(36 / 66, 6) + 1.0) / 4, 6
    )
    assert auc["bfs"] == pytest.approx(want_bfs, abs=2e-6)


def test_expected_freshness_literal(spark):
    last = dt.datetime(2024, 1, 1, 0, 0, 0)
    rates = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["a", "b", "c"],
                "last_ts": [last, last, last],
                "lambda_per_s": [1e-5, 0.0, None],
            }
        )
    )
    as_of = dt.datetime(2024, 1, 2, 0, 0, 0)  # age = 86400 s
    out = {
        r["url"]: r
        for r in recrawl.expected_freshness(rates, as_of).collect()
    }
    assert out["a"]["age_s"] == 86400.0
    assert out["a"]["freshness_r"] == round(math.exp(-1e-5 * 86400), 6)
    assert out["b"]["freshness_r"] == 1.0  # never changes
    assert out["c"]["freshness_r"] is None  # no rate evidence
    roll = recrawl.freshness_rollup(
        recrawl.expected_freshness(rates, as_of), stale_below=0.9
    ).collect()[0]
    assert roll["n_urls"] == 3 and roll["n_scored"] == 2
    assert roll["n_stale"] == 1  # only 'a' (≈0.42) sits below 0.9
    assert roll["min_freshness_r"] == out["a"]["freshness_r"]


def test_expected_freshness_future_capture_null(spark):
    # a capture timestamped AFTER as_of (clock skew) scores null, not >1
    rates = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["x"],
                "last_ts": [dt.datetime(2024, 1, 3)],
                "lambda_per_s": [1e-4],
            }
        )
    )
    out = recrawl.expected_freshness(rates, dt.datetime(2024, 1, 2)).collect()[0]
    assert out["freshness_r"] is None and out["age_s"] < 0


def test_outlink_novelty_yield_signal(spark):
    from spider_spark.operators.ordering import outlink_novelty

    captures = spark.createDataFrame(
        [
            # hub: 3 distinct outlinks (one repeated), 2 unseen
            ("hub", "n1"), ("hub", "n2"), ("hub", "s1"), ("hub", "n1"),
            # exhausted: every outlink already seen
            ("old", "s1"), ("old", "s2"),
            # leaf: no outlinks (explode_outer null row)
            ("leaf", None),
        ],
        "url string, link string",
    )
    seen = spark.createDataFrame(
        [("s1",), ("s2",), ("s3",)], "url_canon string"
    )
    got = {
        r["src"]: (r["n_links"], r["n_novel"], r["novelty_r"])
        for r in outlink_novelty(captures, seen).collect()
    }
    assert got == {
        "hub": (3, 2, round(2 / 3, 6)),
        "old": (2, 0, 0.0),
        "leaf": (0, 0, 0.0),
    }
