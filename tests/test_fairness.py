"""Allocation fairness telemetry (adaptive.allocation_fairness)."""

from __future__ import annotations

from spider_spark.operators import adaptive as ad


def _brute(counts):
    xs = sorted(counts)
    n = len(xs)
    t = sum(xs)
    ranked = sum((i + 1) * x for i, x in enumerate(xs))
    gini = 2 * ranked / (n * t) - (n + 1) / n
    hhi = sum(x * x for x in xs) / (t * t)
    return (
        n, t, round(gini, 6), round(hhi, 6), round(max(xs) / t, 6)
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, w long")


def test_matches_ranked_definition_with_ties(spark):
    # heavy ties: many hosts at the same allocation
    counts = [1] * 20 + [2] * 10 + [5] * 5 + [40, 40, 100]
    rows = [(f"h{i}", c) for i, c in enumerate(counts)]
    got = ad.allocation_fairness(_df(spark, rows), "k", "w").collect()[0]
    assert (
        got["n_keys"], got["total"], got["gini_r"], got["hhi_r"],
        got["top_share_r"],
    ) == _brute(counts)


def test_row_count_mode_and_uniform_zero(spark):
    # weight_col=None counts rows; 4 keys x 3 rows each -> gini 0
    rows = [(f"h{i % 4}", 0) for i in range(12)]
    got = ad.allocation_fairness(_df(spark, rows), "k").collect()[0]
    assert got["n_keys"] == 4 and got["total"] == 12
    assert got["gini_r"] == 0.0
    assert got["hhi_r"] == 0.25 and got["top_share_r"] == 0.25


def test_concentration_extremes(spark):
    # one key hogging everything among many 1-unit keys -> gini near 1
    rows = [("big", 10_000)] + [(f"h{i}", 1) for i in range(99)]
    got = ad.allocation_fairness(_df(spark, rows), "k", "w").collect()[0]
    assert got["gini_r"] > 0.97
    assert got["top_share_r"] > 0.99
    # a single key is trivially "equal"
    one = ad.allocation_fairness(_df(spark, [("h", 7)]), "k", "w").collect()[0]
    assert one["gini_r"] == 0.0 and one["top_share_r"] == 1.0


def test_empty_input(spark):
    got = ad.allocation_fairness(
        _df(spark, []).limit(0), "k", "w"
    ).collect()[0]
    assert got["n_keys"] == 0
    assert got["gini_r"] is None and got["hhi_r"] is None
