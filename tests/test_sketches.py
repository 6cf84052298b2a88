"""Misra-Gries heavy hitters + Count-Min Sketch (operators/sketches.py).

The properties under test are the published guarantees:
- MG: any key with count > n/(k+1) is in the candidate union; the exact
  recount makes heavy_hitters EQUAL the brute-force groupBy answer.
- CMS: estimates never undercount; merge(CMS(a), CMS(b)) == CMS(a ∪ b).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import sketches as sk


def _skewed(spark, n=2000, parts=7):
    # deterministic zipf-ish skew: key 'h0' ~50%, 'h1' ~25%, tail spread
    df = spark.range(n).repartition(parts)
    key = (
        F.when(F.col("id") % 2 == 0, F.lit("h0"))
        .when(F.col("id") % 4 == 1, F.lit("h1"))
        .otherwise(F.concat(F.lit("tail-"), (F.col("id") % 97).cast("string")))
    )
    return df.select(key.alias("key"))


def _exact_hh(df, k):
    n = df.count()
    return {
        r["key"]: r["cnt"]
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r["cnt"] * (k + 1) > n
    }


def test_heavy_hitters_equal_bruteforce(spark):
    df = _skewed(spark)
    for k in (3, 10):
        got = {r["key"]: r["cnt"] for r in sk.heavy_hitters(df, "key", k=k).collect()}
        assert got == _exact_hh(df, k)
    # k=4 (threshold n/5 = 20%) must include both planted heads (50%, 25%);
    # at k=3 the 25% head sits exactly ON n/4 and the strict > excludes it
    got4 = sk.heavy_hitters(df, "key", k=4)
    keys = {r["key"] for r in got4.collect()}
    assert {"h0", "h1"} <= keys


def test_heavy_hitters_min_frac_and_guard(spark):
    df = _skewed(spark)
    got = {
        r["key"]: r["frac_r"]
        for r in sk.heavy_hitters(df, "key", k=10, min_frac=0.2).collect()
    }
    assert set(got) == {"h0", "h1"}
    assert got["h0"] == pytest.approx(0.5, abs=1e-6)
    with pytest.raises(ValueError):
        # 0.05 < 1/(3+1): below the MG recall guarantee
        sk.heavy_hitters(df, "key", k=3, min_frac=0.05)


def test_mg_candidates_bounded_and_total(spark):
    df = _skewed(spark, n=1500, parts=5)
    k = 4
    summ = sk.mg_candidates(df, "key", k=k).collect()
    nulls = [r for r in summ if r["key"] is None]
    cands = [r for r in summ if r["key"] is not None]
    assert len(nulls) == 5  # one total row per partition
    assert sum(r["cnt"] for r in nulls) == 1500
    assert len(cands) <= k * 5  # ≤ k counters per partition


def test_heavy_hitters_ignores_null_keys(spark):
    pdf = pd.DataFrame({"key": ["a"] * 8 + [None] * 20 + ["b"] * 2})
    df = spark.createDataFrame(pdf).repartition(3)
    got = {r["key"]: r["cnt"] for r in sk.heavy_hitters(df, "key", k=2).collect()}
    # n counts only non-null rows (10): a=8 > 10/3 qualifies, b=2 doesn't
    assert got == {"a": 8}


def test_cms_never_undercounts_and_exact_on_light_load(spark):
    df = _skewed(spark)
    sketch = sk.count_min_sketch(df, "key", depth=4, width=256)
    est = {
        r["key"]: r["est_cnt"]
        for r in sk.cms_estimate(sketch, df, "key", depth=4, width=256).collect()
    }
    exact = {
        r["key"]: r["cnt"]
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert set(est) == set(exact)
    n = sum(exact.values())
    for key, true_cnt in exact.items():
        assert est[key] >= true_cnt, key
        assert est[key] <= n
    # ~99 distinct keys into 4×256 counters: heads must estimate exactly
    assert est["h0"] == exact["h0"]


def test_cms_counter_matrix_bounded(spark):
    df = _skewed(spark, n=5000)
    sketch = sk.count_min_sketch(df, "key", depth=3, width=32)
    rows = sketch.collect()
    assert len(rows) <= 3 * 32
    assert all(0 <= r["bucket"] < 32 and 0 <= r["hrow"] < 3 for r in rows)
    # total mass per hash row == n (every input row lands once per row)
    per_row = {}
    for r in rows:
        per_row[r["hrow"]] = per_row.get(r["hrow"], 0) + r["cnt"]
    assert per_row == {0: 5000, 1: 5000, 2: 5000}


def test_cms_mergeable(spark):
    a = _skewed(spark, n=600, parts=3)
    b = spark.range(400).select(
        F.concat(F.lit("x"), (F.col("id") % 11).cast("string")).alias("key")
    )
    merged = sk.cms_merge(
        sk.count_min_sketch(a, "key", depth=4, width=64),
        sk.count_min_sketch(b, "key", depth=4, width=64),
    )
    direct = sk.count_min_sketch(a.unionByName(b), "key", depth=4, width=64)
    m = {(r["hrow"], r["bucket"]): r["cnt"] for r in merged.collect()}
    d = {(r["hrow"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert m == d


def test_cms_weighted(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"key": ["a", "a", "b"], "bytes": [10, 5, 7]})
    )
    sketch = sk.count_min_sketch(df, "key", depth=4, width=64, weight_col="bytes")
    est = {
        r["key"]: r["est_cnt"]
        for r in sk.cms_estimate(sketch, df, "key", depth=4, width=64).collect()
    }
    assert est["a"] >= 15 and est["b"] >= 7
    assert est["a"] + est["b"] <= 2 * 22  # sane: no runaway counters


def test_cms_bucket_engine_portable(spark):
    """The md5 bucket must match DuckDB's restatement bit-for-bit — the
    property the oracle relies on."""
    import duckdb

    keys = ["hot-a.example", "tail-src3", "", "häst", "a:b"]
    df = spark.createDataFrame(pd.DataFrame({"key": keys}))
    got = df.select(
        "key", *[sk.col_cms_bucket(F.col("key"), i, 64).alias(f"b{i}") for i in range(3)]
    ).collect()
    con = duckdb.connect()
    for row in got:
        for i in range(3):
            want = con.execute(
                "SELECT CAST(('0x' || substr(md5(? || ':' || ?), 1, 8))::UBIGINT"
                " % 64 AS INT)",
                [str(i), row["key"]],
            ).fetchone()[0]
            assert row[f"b{i}"] == want, (row["key"], i)
