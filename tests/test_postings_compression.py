"""Gap+VByte postings storage estimate (index.postings_compression_stats)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from spider_spark.operators import index as ix


def _vb(v):
    n = 1
    while v >= 128:
        v >>= 7
        n += 1
    return n


def _brute(texts):
    lists = {}
    for i, t in enumerate(texts):
        for tok in set(re.findall(r"[a-z0-9]+", (t or "").lower())):
            lists.setdefault(tok, []).append(i)
    out = {}
    for term, ids in lists.items():
        ids.sort()
        cost = _vb(ids[0] + 1) + sum(
            _vb(b - a) for a, b in zip(ids, ids[1:])
        )
        out[term] = (len(ids), 8 * len(ids), cost)
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vbyte_len_boundaries(spark):
    vals = [0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 128**4 - 1, 128**4]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v", ix.col_vbyte_len(F.col("v")).alias("n")
    )
    got = {r["v"]: r["n"] for r in df.collect()}
    assert got == {0: 1, 1: 1, 127: 1, 128: 2, 16383: 2, 16384: 3,
                   2097151: 3, 2097152: 4, 128**4 - 1: 4, 128**4: 5}


def test_matches_sequential_definition(spark):
    texts = ["fox pad", "fox", "pad fox", "fox pad zip", "zip"]
    want = _brute(texts)
    rows = ix.postings_compression_stats(
        _docs(spark, [(i, t) for i, t in enumerate(texts)]), bucket_bits=1
    ).collect()
    got = {r["term"]: (r["df"], r["raw_bytes"], r["vbyte_bytes"]) for r in rows}
    assert got == want


def test_bucketing_invariance_and_vs_naive_window(spark):
    # sparse ids force multi-byte gaps and many empty buckets
    rows = [(i * 9973 + (i % 7) * 131071, f"fox w{i % 3}") for i in range(60)]
    df = _docs(spark, rows)
    # naive single-window reference computed inline
    post = ix.postings(df)
    w = Window.partitionBy("term").orderBy("doc_id")
    naive = (
        post.withColumn("prev", F.lag("doc_id").over(w))
        .withColumn(
            "cost",
            F.when(
                F.col("prev").isNull(),
                ix.col_vbyte_len(F.col("doc_id") + 1),
            ).otherwise(ix.col_vbyte_len(F.col("doc_id") - F.col("prev"))),
        )
        .groupBy("term")
        .agg(F.sum("cost").alias("vb"))
    )
    want = {r["term"]: r["vb"] for r in naive.collect()}
    for bits in (4, 12, 40):
        got = {
            r["term"]: r["vbyte_bytes"]
            for r in ix.postings_compression_stats(df, bucket_bits=bits).collect()
        }
        assert got == want, bits


def test_ratio_and_df(spark):
    rows = ix.postings_compression_stats(
        _docs(spark, [(0, "fox"), (1, "fox")]), bucket_bits=20
    ).collect()
    r = {x["term"]: x for x in rows}["fox"]
    # ids [0,1]: vb(0+1)=1, vb(1)=1 -> 2 bytes vs 16 raw
    assert (r["df"], r["raw_bytes"], r["vbyte_bytes"]) == (2, 16, 2)
    assert abs(r["ratio_r"] - 0.125) < 1e-9


def test_rejects_bad_bucket_bits(spark):
    with pytest.raises(ValueError):
        ix.postings_compression_stats(_docs(spark, [(0, "x")]), bucket_bits=0)


def _ef_bits(n, max_id):
    u = max_id + 1
    q = u // n
    l = max(0, q.bit_length() - 1)
    return n * l + n + (u >> l)


def _ef_brute(texts):
    lists = {}
    for i, t in enumerate(texts):
        for tok in set(re.findall(r"[a-z0-9]+", (t or "").lower())):
            lists.setdefault(tok, []).append(i)
    out = {}
    for term, ids in lists.items():
        bits = _ef_bits(len(ids), max(ids))
        out[term] = (len(ids), 8 * len(ids), bits, (bits + 7) // 8)
    return out


def test_floor_log2_exact_at_powers_of_two(spark):
    vals = [1, 2, 3, 4, 7, 8, 1023, 1024, 2**40 - 1, 2**40, 2**52 + 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v", ix.col_floor_log2(F.col("v")).alias("l")
    )
    got = {r["v"]: r["l"] for r in df.collect()}
    assert got == {v: v.bit_length() - 1 for v in vals}


def test_elias_fano_matches_formula(spark):
    texts = ["fox pad", "fox", "pad fox", "fox pad zip", "zip", None, "fox"]
    want = _ef_brute(texts)
    rows = ix.elias_fano_stats(
        _docs(spark, [(i, t) for i, t in enumerate(texts)])
    ).collect()
    got = {
        r["term"]: (r["df"], r["raw_bytes"], r["ef_bits"], r["ef_bytes"])
        for r in rows
    }
    assert got == want
    # ratio sanity: ef_bytes / raw_bytes, rounded
    for r in rows:
        assert r["ratio_r"] == round(r["ef_bytes"] / (r["df"] * 8.0), 6)


def test_elias_fano_sparse_vs_dense_sizing(spark):
    # A dense list (every id) compresses to ~2 bits/posting; a single
    # faraway posting pays the whole upper-bits runway. EF beats raw
    # int64 in both, and dense beats sparse per posting.
    dense = [(i, "densely") for i in range(64)]
    sparse = [(0, "sparsely"), (10_000, "sparsely")]
    rows = ix.elias_fano_stats(_docs(spark, dense + sparse)).collect()
    by = {r["term"]: r for r in rows}
    d, s = by["densely"], by["sparsely"]
    assert d["ef_bits"] == _ef_bits(64, 63)
    assert s["ef_bits"] == _ef_bits(2, 10_000)
    assert d["ef_bits"] / d["df"] < s["ef_bits"] / s["df"]
    assert d["ef_bytes"] < d["raw_bytes"] and s["ef_bytes"] < s["raw_bytes"]


def test_elias_fano_single_shuffle_plan(spark):
    plan = ix.elias_fano_stats(
        _docs(spark, [(0, "a b"), (1, "b")])
    )._jdf.queryExecution().executedPlan().toString()
    # censuses only: postings groupBy + per-term agg; no window, no join
    assert "Window" not in plan and "Join" not in plan
