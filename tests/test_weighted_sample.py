"""Efraimidis-Spirakis weighted sampling (curation.weighted_sample)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from spider_spark.operators import curation as cu


def _u(doc_id) -> float:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    return (h + 0.5) / 2**32


def _key(doc_id, w) -> float:
    return round(math.log(_u(doc_id)) / w, 9)


def _brute(rows, k, by_stratum):
    # rows: (doc_id, stratum, weight)
    strata = {}
    for i, s, w in rows:
        if w is None or w <= 0:
            continue
        strata.setdefault(s if by_stratum else "", []).append((i, w))
    out = {}
    for s, docs in strata.items():
        ranked = sorted(docs, key=lambda d: (-_key(d[0], d[1]), d[0]))
        out[s] = [i for i, _ in ranked[:k]]
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, stratum string, weight double"
    )


def test_matches_brute_force_per_stratum(spark):
    rows = [
        (i, "abc"[i % 3], float(1 + (i * 7) % 5)) for i in range(60)
    ] + [(60, "a", None), (61, "b", 0.0), (62, "c", -3.0)]
    got = cu.weighted_sample(
        _df(spark, rows), k=4, weight_col="weight", strata_col="stratum"
    ).collect()
    want = _brute(rows, 4, by_stratum=True)
    by_s = {}
    for r in sorted(got, key=lambda r: r["sample_rank"]):
        by_s.setdefault(r["stratum"], []).append(r["doc_id"])
    assert by_s == want
    for r in got:
        assert r["sample_key_r"] == _key(r["doc_id"], r["weight"])


def test_matches_brute_force_global(spark):
    rows = [(i, "s", float(1 + i % 9)) for i in range(40)]
    got = cu.weighted_sample(_df(spark, rows), k=7, weight_col="weight")
    ids = [
        r["doc_id"]
        for r in sorted(got.collect(), key=lambda r: r["sample_rank"])
    ]
    assert ids == _brute(rows, 7, by_stratum=False)[""]


def test_inclusion_probability_tracks_weight(spark):
    # 400 independent strata, each {heavy w=9, light w=1}, sample 1:
    # P(heavy) = 0.9; binomial sd = sqrt(400*.9*.1) = 6 -> 360 +/- 4sd.
    rows = []
    for s in range(400):
        rows.append((2 * s, f"s{s}", 9.0))
        rows.append((2 * s + 1, f"s{s}", 1.0))
    got = cu.weighted_sample(
        _df(spark, rows), k=1, weight_col="weight", strata_col="stratum"
    ).collect()
    assert len(got) == 400
    heavy = sum(1 for r in got if r["doc_id"] % 2 == 0)
    assert 336 <= heavy <= 384


def test_two_phase_equals_naive_window(spark):
    rows = [(i, "xy"[i % 2], float(1 + i % 4)) for i in range(50)]
    df = _df(spark, rows)
    fast = {
        (r["stratum"], r["sample_rank"]): r["doc_id"]
        for r in cu.weighted_sample(
            df, k=5, weight_col="weight", strata_col="stratum", salt=8
        ).collect()
    }
    key = F.round(F.log(cu.col_hash_uniform("doc_id")) / F.col("weight"), 9)
    w = Window.partitionBy("stratum").orderBy(
        F.col("_k").desc(), F.col("doc_id").asc()
    )
    naive = {
        (r["stratum"], r["rk"]): r["doc_id"]
        for r in df.withColumn("_k", key)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .collect()
    }
    assert fast == naive


def test_partitioning_invariance(spark):
    rows = [(i, "abc"[i % 3], float(1 + i % 6)) for i in range(90)]
    outs = []
    for n in (1, 8):
        df = _df(spark, rows).repartition(n)
        outs.append(
            sorted(
                (r["stratum"], r["sample_rank"], r["doc_id"])
                for r in cu.weighted_sample(
                    df, k=3, weight_col="weight", strata_col="stratum"
                ).collect()
            )
        )
    assert outs[0] == outs[1]


def test_validation(spark):
    df = _df(spark, [(0, "a", 1.0)])
    with pytest.raises(ValueError):
        cu.weighted_sample(df, k=0, weight_col="weight")
    with pytest.raises(ValueError):
        cu.weighted_sample(df, k=1, weight_col="weight", salt=0)
