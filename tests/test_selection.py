"""Data-selection operators: hashed linear quality classifier (closed-form
naive-Bayes log-odds weights) and DSIR importance weights (Xie et al. 2023).

Pins: exact hand-computed weights/scores on a tiny corpus (same md5 bucket
arithmetic in pure Python), class separation on a synthetic labeled corpus,
DSIR monotonicity toward the target distribution, empty/degenerate docs,
and the measured broadcast gate (plan-shape both sides of the threshold)."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import selection


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_auto_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    if old_aqe is not None:
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def py_bucket(token: str, n_buckets: int) -> int:
    """The engine-portable bucket in pure Python — must agree with Spark."""
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % n_buckets


def test_token_bucket_matches_python(spark):
    toks = ["alpha", "beta", "Ünïcode", "x", ""]
    df = spark.createDataFrame([(t,) for t in toks], ["tok"]).select(
        "tok", selection.token_bucket(F.col("tok"), 4096).alias("b")
    )
    got = {r["tok"]: r["b"] for r in df.collect()}
    for t in toks:
        assert got[t] == py_bucket(t, 4096)


def test_train_weights_exact_tiny(spark):
    """Hand-compute the NB log-odds on a 2-doc corpus and compare exactly."""
    n_b = 64
    pos = spark.createDataFrame([("good wiki",)], ["text"])
    neg = spark.createDataFrame([("spam spam",)], ["text"])
    w = {r["bucket"]: r["weight"]
         for r in selection.train_token_weights(pos, neg, n_buckets=n_b).collect()}
    bg, bw, bs = py_bucket("good", n_b), py_bucket("wiki", n_b), py_bucket("spam", n_b)
    assert bg != bs and bw != bs  # fixture sanity: no collisions at these tokens
    # pos_tot=2, neg_tot=2, alpha=1, B=64
    exp_good = math.log((1 + 1) / (2 + 64)) - math.log((0 + 1) / (2 + 64))
    exp_spam = math.log((0 + 1) / (2 + 64)) - math.log((2 + 1) / (2 + 64))
    assert w[bg] == pytest.approx(exp_good, abs=1e-12)
    assert w[bs] == pytest.approx(exp_spam, abs=1e-12)


def test_classifier_separates_classes(spark):
    pos_rows = [(f"wiki article reference encyclopedia neutral citation {i}",)
                for i in range(20)]
    neg_rows = [(f"buy cheap pills casino winner click {i}",) for i in range(20)]
    pos = spark.createDataFrame(pos_rows, ["text"])
    neg = spark.createDataFrame(neg_rows, ["text"])
    w = selection.train_token_weights(pos, neg, n_buckets=1 << 14)
    test = spark.createDataFrame(
        [(0, "encyclopedia article with neutral citation"),
         (1, "click here casino winner cheap pills"),
         (2, "")],
        ["doc_id", "text"],
    )
    got = {r["id"]: r for r in selection.linear_quality_score(test, w, n_buckets=1 << 14).collect()}
    assert got[0]["prob"] > 0.9
    assert got[1]["prob"] < 0.1
    assert got[2]["n_tokens"] == 0 and got[2]["prob"] == pytest.approx(0.5)  # sigmoid(bias=0)


def test_classifier_bias_shifts_empty_doc(spark):
    w = spark.createDataFrame([(0, 0.0)], ["bucket", "weight"])
    test = spark.createDataFrame([(0, "")], ["doc_id", "text"])
    out = selection.linear_quality_score(test, w, bias=2.0).collect()[0]
    assert out["prob"] == pytest.approx(1 / (1 + math.exp(-2.0)))


def test_dsir_prefers_target_like_docs(spark):
    target = spark.createDataFrame(
        [(f"protein genome enzyme molecule cell {i}",) for i in range(10)], ["text"]
    )
    raw = spark.createDataFrame(
        [(0, "protein genome enzyme molecule cell biology"),
         (1, "football goal referee penalty match stadium"),
         (2, "protein football genome goal enzyme referee")],
        ["doc_id", "text"],
    )
    got = {r["id"]: r["log_weight"]
           for r in selection.dsir_log_weights(raw, target, n_buckets=1 << 14).collect()}
    assert got[0] > got[2] > got[1]


def test_dsir_exact_tiny_unigrams(spark):
    """Exact check against a pure-Python reimplementation (unigrams only)."""
    n_b = 128
    target = spark.createDataFrame([("aa aa bb",)], ["text"])
    raw = spark.createDataFrame([(0, "aa cc"), (1, "")], ["doc_id", "text"])
    got = {r["id"]: r for r in selection.dsir_log_weights(
        raw, target, n_buckets=n_b, include_bigrams=False).collect()}

    from collections import Counter
    p_cnt = Counter(py_bucket(t, n_b) for t in "aa aa bb".split())
    q_cnt = Counter(py_bucket(t, n_b) for t in "aa cc".split())
    p_tot, q_tot = 3, 2
    def lr(tok):
        b = py_bucket(tok, n_b)
        lp = math.log((p_cnt.get(b, 0) + 1) / (p_tot + n_b))
        lq = math.log((q_cnt.get(b, 0) + 1) / (q_tot + n_b))
        return lp - lq
    assert got[0]["log_weight"] == pytest.approx(lr("aa") + lr("cc"), abs=1e-10)
    assert got[0]["n_feats"] == 2
    assert got[1]["n_feats"] == 0 and got[1]["log_weight"] == 0.0


def test_dsir_bigram_feature_count(spark):
    target = spark.createDataFrame([("x y z",)], ["text"])
    raw = spark.createDataFrame([(0, "a b c d"), (1, "solo")], ["doc_id", "text"])
    got = {r["id"]: r["n_feats"]
           for r in selection.dsir_log_weights(raw, target, n_buckets=256).collect()}
    assert got[0] == 4 + 3  # 4 unigrams + 3 bigrams
    assert got[1] == 1      # single token → no bigrams


def test_score_broadcast_gate_both_sides(spark, no_auto_broadcast, monkeypatch):
    docs = spark.createDataFrame([(0, "alpha beta"), (1, "gamma")], ["doc_id", "text"])
    w = spark.createDataFrame([(py_bucket("alpha", 64), 1.0)], ["bucket", "weight"])
    under = selection.linear_quality_score(docs, w, n_buckets=64)
    assert "BroadcastHashJoin" in _physical(under)
    monkeypatch.setattr(selection, "SELECTION_BROADCAST_ROWS", 0)
    over = selection.linear_quality_score(docs, w, n_buckets=64)
    assert "BroadcastHashJoin" not in _physical(over)
    # pinned strategies skip the probe entirely
    pinned = selection.linear_quality_score(docs, w, n_buckets=64, broadcast=True)
    assert "BroadcastHashJoin" in _physical(pinned)
