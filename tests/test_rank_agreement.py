"""Ranker agreement: Spearman rho + Kendall tau-b (index.ranking_agreement)."""

from __future__ import annotations

import math

from spider_spark.operators import index as ix


def _brute(xa, xb):
    n = len(xa)

    def avg_ranks(xs):
        order = sorted(range(n), key=lambda i: -xs[i])
        rn = {}
        for pos, i in enumerate(order):
            rn[i] = pos + 1
        out = [0.0] * n
        for i in range(n):
            ties = [j for j in range(n) if xs[j] == xs[i]]
            out[i] = sum(rn[j] for j in ties) / len(ties)
        return out

    ra, rb = avg_ranks(xa), avg_ranks(xb)
    sx = sum(ra); sy = sum(rb)
    sxx = sum(v * v for v in ra); syy = sum(v * v for v in rb)
    sxy = sum(u * v for u, v in zip(ra, rb))
    dx = n * sxx - sx * sx; dy = n * syy - sy * sy
    spear = (n * sxy - sx * sy) / math.sqrt(dx * dy) if dx > 0 and dy > 0 else None
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            da = (xa[i] > xa[j]) - (xa[i] < xa[j])
            db = (xb[i] > xb[j]) - (xb[i] < xb[j])
            if da * db > 0:
                c += 1
            elif da * db < 0:
                d += 1
            elif da == 0 and db != 0:
                tx += 1
            elif db == 0 and da != 0:
                ty += 1
    denom = math.sqrt((c + d + tx) * (c + d + ty))
    tau = (c - d) / denom if denom > 0 else None
    rnd = lambda v: None if v is None else round(v, 6)
    return n, rnd(spear), rnd(tau)


def _pair(spark, xa, xb):
    a = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(xa)], "doc_id long, score_r double"
    )
    b = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(xb)], "doc_id long, score_r double"
    )
    return ix.ranking_agreement(a, b).collect()[0]


def test_matches_brute_force_with_ties(spark):
    xa = [5, 3, 3, 9, 1, 7, 7, 7, 2, 4]
    xb = [4, 3, 6, 8, 2, 7, 1, 7, 2, 4]
    got = _pair(spark, xa, xb)
    assert (got["n"], got["spearman_r"], got["kendall_r"]) == _brute(xa, xb)


def test_perfect_and_reversed(spark):
    xa = [1, 2, 3, 4, 5]
    same = _pair(spark, xa, xa)
    assert same["spearman_r"] == 1.0 and same["kendall_r"] == 1.0
    rev = _pair(spark, xa, list(reversed(xa)))
    assert rev["spearman_r"] == -1.0 and rev["kendall_r"] == -1.0


def test_intersection_only_and_degenerate(spark):
    a = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (9, 5.0)], "doc_id long, score_r double"
    )
    b = spark.createDataFrame(
        [(0, 2.0), (1, 1.0), (7, 9.0)], "doc_id long, score_r double"
    )
    got = ix.ranking_agreement(a, b).collect()[0]
    assert got["n"] == 2 and got["kendall_r"] == -1.0
    # all-tied side -> null coefficients
    allt = _pair(spark, [3, 3, 3], [1, 2, 3])
    assert allt["spearman_r"] is None and allt["kendall_r"] is None


def test_no_nested_loop_plan(spark):
    a = spark.createDataFrame(
        [(i, float(i)) for i in range(6)], "doc_id long, score_r double"
    )
    plan = (
        ix.ranking_agreement(a, a)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan
