"""Retrieval evaluation (precision/recall/RR/nDCG @k) — differential
against a pure-Python reimplementation plus pinned hand-computed values
and an integration run over the real BM25 ranker."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import index as idx

RES_SCHEMA = "query_id bigint, doc_id bigint, rank int"
QREL_SCHEMA = "query_id bigint, doc_id bigint, rel int"


def _brute(results, qrels, k):
    by_q_res: dict = {}
    for q, d, r in results:
        if r <= k:
            by_q_res.setdefault(q, []).append((r, d))
    by_q_rel: dict = {}
    for q, d, rel in qrels:
        if rel > 0:
            by_q_rel.setdefault(q, {})[d] = rel
    out = {}
    for q in set(by_q_res) | set(by_q_rel):
        res = sorted(by_q_res.get(q, []))
        rels = by_q_rel.get(q, {})
        hits = [(r, rels[d]) for r, d in res if d in rels]
        dcg = sum((2**rel - 1) / math.log2(r + 1) for r, rel in hits)
        ideal = sorted(rels.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        idcg = sum((2**rel - 1) / math.log2(i + 2) for i, (_, rel) in enumerate(ideal))
        out[q] = {
            "n_retrieved": len(res),
            "n_rel": len(rels),
            "n_rel_ret": len(hits),
            "precision": len(hits) / k,
            "recall": len(hits) / len(rels) if rels else None,
            "rr": 1.0 / hits[0][0] if hits else 0.0,
            "ndcg": dcg / idcg if idcg > 0 else None,
        }
    return out


def test_matches_brute_force(spark):
    results = [
        (q, (q * 17 + r * 13) % 50, r) for q in range(6) for r in range(1, 11)
    ]
    qrels = [
        (q, d, 1 + (d % 3))
        for q in range(6)
        for d in range(50)
        if (d * 7 + q * 3) % 9 == 0
    ]
    got = {
        r.query_id: r
        for r in idx.retrieval_eval(
            spark.createDataFrame(results, RES_SCHEMA),
            spark.createDataFrame(qrels, QREL_SCHEMA),
            k=10,
        ).collect()
    }
    want = _brute(results, qrels, 10)
    assert set(got) == set(want)
    for q, w in want.items():
        g = got[q]
        assert g.n_retrieved == w["n_retrieved"]
        assert g.n_rel == w["n_rel"]
        assert g.n_rel_ret == w["n_rel_ret"]
        assert g.precision_at_k == pytest.approx(w["precision"])
        assert g.rr_at_k == pytest.approx(w["rr"])
        if w["recall"] is None:
            assert g.recall_at_k is None
        else:
            assert g.recall_at_k == pytest.approx(w["recall"])
        if w["ndcg"] is None:
            assert g.ndcg_at_k is None
        else:
            assert g.ndcg_at_k == pytest.approx(w["ndcg"])


def test_perfect_ranking_ndcg_is_one(spark):
    # results rank docs exactly by descending rel → nDCG = 1
    qrels = [(1, 10, 3), (1, 11, 2), (1, 12, 1)]
    results = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
    row = idx.retrieval_eval(
        spark.createDataFrame(results, RES_SCHEMA),
        spark.createDataFrame(qrels, QREL_SCHEMA),
        k=10,
    ).collect()[0]
    assert row.ndcg_at_k == pytest.approx(1.0)
    assert row.rr_at_k == 1.0
    assert row.recall_at_k == pytest.approx(1.0)


def test_judged_query_missing_from_results_emits_zero_row(spark):
    qrels = [(7, 1, 1)]
    results = [(1, 1, 1)]  # query 7 never retrieved anything
    rows = {
        r.query_id: r
        for r in idx.retrieval_eval(
            spark.createDataFrame(results, RES_SCHEMA),
            spark.createDataFrame(qrels, QREL_SCHEMA),
        ).collect()
    }
    assert rows[7].n_retrieved == 0
    assert rows[7].rr_at_k == 0.0
    assert rows[7].recall_at_k == 0.0
    # query 1 has no judgments: recall/ndcg NULL, rr 0
    assert rows[1].recall_at_k is None
    assert rows[1].ndcg_at_k is None
    assert rows[1].rr_at_k == 0.0


def test_summary_averages_only_judged(spark):
    qrels = [(1, 10, 1)]
    results = [(1, 10, 1), (2, 20, 1)]  # query 2 unjudged
    per_q = idx.retrieval_eval(
        spark.createDataFrame(results, RES_SCHEMA),
        spark.createDataFrame(qrels, QREL_SCHEMA),
        k=5,
    )
    s = idx.retrieval_eval_summary(per_q).collect()[0]
    assert s.n_queries == 2 and s.n_judged == 1
    assert s.mrr == pytest.approx(1.0)
    assert s.mean_ndcg == pytest.approx(1.0)
    assert s.mean_precision == pytest.approx(1 / 5)


def test_integration_with_bm25(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data across executors"),
            (2, "spark spark spark tuning guide"),
            (3, "cats and dogs"),
            (4, "a spark of joy"),
        ],
        "doc_id bigint, text string",
    )
    ranked = idx.bm25_search(docs, "spark tuning", k=4).select(
        F.lit(1).cast("bigint").alias("query_id"), "doc_id", "rank"
    )
    qrels = spark.createDataFrame([(1, 2, 2), (1, 1, 1)], QREL_SCHEMA)
    row = idx.retrieval_eval(ranked, qrels, k=4).collect()[0]
    assert row.n_rel_ret == 2
    assert row.rr_at_k == 1.0  # doc 2 (both query terms, highest bm25) ranks first
    assert row.recall_at_k == pytest.approx(1.0)
    # doc 1 may rank below unjudged docs, so nDCG < 1 is legitimate
    assert 0.9 < row.ndcg_at_k <= 1.0


def test_rbp_err_brute_force(spark):
    results = spark.createDataFrame(
        [("q1", d, r) for r, d in enumerate([10, 11, 12, 13], 1)]
        + [("q2", d, r) for r, d in enumerate([20, 21], 1)]
        + [("q3", 30, 1)],  # entirely unjudged
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", 10, 3), ("q1", 12, 1), ("q2", 21, 2), ("q4", 40, 1)],
        "query_id string, doc_id long, rel int",
    )
    p, k, mr = 0.8, 10, 3
    got = {
        r["query_id"]: (r["rbp_r"], r["err_r"], r["rbp_residual_r"])
        for r in idx.rbp_err_eval(results, qrels, k=k, p=p, max_rel=mr).collect()
    }

    runs = {"q1": [(1, 3), (2, 0), (3, 1), (4, 0)], "q2": [(1, 0), (2, 2)],
            "q3": [(1, 0)]}
    for q, ranked in runs.items():
        rbp = (1 - p) * sum(
            (p ** (r - 1)) for r, rel in ranked if rel > 0
        )
        err, surv = 0.0, 1.0
        for r, rel in ranked:
            R = (2**rel - 1) / 2**mr
            err += surv * R / r
            surv *= 1 - R
        assert got[q][0] == round(rbp, 6), q
        assert abs(got[q][1] - err) < 2e-6, q
    assert got["q3"] == (0.0, 0.0, round(p**k, 6))
    # judged query missing from results emits zeros, never silence
    assert got["q4"][0] == 0.0 and got["q4"][1] == 0.0
    # cascade property: q1's highly-relevant rank-1 dominates its ERR
    assert got["q1"][1] > 0.8 * (7 / 8)


def test_rbp_err_validation(spark):
    df = spark.createDataFrame([("q", 1, 1)], "query_id string, doc_id long, rank int")
    qr = spark.createDataFrame([("q", 1, 1)], "query_id string, doc_id long, rel int")
    with pytest.raises(ValueError):
        idx.rbp_err_eval(df, qr, p=1.0)
    with pytest.raises(ValueError):
        idx.rbp_err_eval(df, qr, k=0)
