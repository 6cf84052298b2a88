"""Adaptive recrawl scheduling (operators/recrawl.py): Cho &
Garcia-Molina change-rate estimation + interval clamping."""

import datetime as dt
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from spider_spark.operators import recrawl


def _caps(spark, rows):
    return spark.createDataFrame(
        [Row(url=u, ts=t, fp=f, seq=i) for i, (u, t, f) in enumerate(rows)]
    )


def _t(h):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


def test_change_rate_matches_cho_molina_formula(spark):
    # url A: 5 captures hourly, 2 changes; url B: never changes; url C: 1 capture
    rows = [
        ("a", _t(0), "x"),
        ("a", _t(1), "x"),
        ("a", _t(2), "y"),
        ("a", _t(3), "y"),
        ("a", _t(4), "z"),
        ("b", _t(0), "k"),
        ("b", _t(2), "k"),
        ("c", _t(0), "q"),
    ]
    out = {
        r.url: r
        for r in recrawl.change_rate(
            _caps(spark, rows), tiebreak_col="seq"
        ).collect()
    }
    a = out["a"]
    assert (a.n_captures, a.n_changes) == (5, 2)
    # n=4 intervals of 3600 s, X=2: lambda = -ln((4-2+0.5)/(4+0.5))/3600
    assert math.isclose(a.lambda_per_s, -math.log(2.5 / 4.5) / 3600, rel_tol=1e-12)
    b = out["b"]
    assert b.n_changes == 0
    # zero observed changes -> rate exactly 0 (normalized +0.0, not -0.0)
    assert b.lambda_per_s == 0.0 and math.copysign(1, b.lambda_per_s) == 1.0
    c = out["c"]
    assert c.n_captures == 1 and c.lambda_per_s is None


def test_change_rate_orders_by_timestamp_not_input_order(spark):
    # shuffled input: same estimate as sorted input
    rows = [
        ("a", _t(2), "y"),
        ("a", _t(0), "x"),
        ("a", _t(1), "x"),
    ]
    out = recrawl.change_rate(_caps(spark, rows), tiebreak_col="seq").collect()[0]
    assert out.n_changes == 1  # x -> x -> y in time order


def test_recrawl_intervals_clamp_and_null_policy(spark):
    rows = [
        ("fast", _t(0), "a"),
        ("fast", _t(1), "b"),  # changes every capture -> tiny interval
        ("solo", _t(0), "a"),  # no evidence -> max interval
    ]
    rates = recrawl.change_rate(_caps(spark, rows), tiebreak_col="seq")
    out = {
        r.url: r.interval_s
        for r in recrawl.recrawl_intervals(
            rates, min_interval_s=600, max_interval_s=86400
        ).collect()
    }
    # fast: 1/lambda = 3600/ln(1.5/0.5) ~ 3277 s, inside the clamp
    assert math.isclose(out["fast"], 3600 / math.log(1.5 / 0.5), rel_tol=1e-9)
    assert out["solo"] == 86400.0
