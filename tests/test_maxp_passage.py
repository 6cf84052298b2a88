"""Passage-level BM25 MaxP retrieval (index.bm25_maxp_search)."""

from __future__ import annotations

import math
import re

import pytest

from spider_spark.operators import index as ix


def _brute(texts, query, k, ptok):
    terms = sorted(set(re.findall(r"[a-z0-9]+", query.lower())))
    passages = {}  # (doc, p) -> {term: tf}
    for d, t in enumerate(texts):
        toks = re.findall(r"[a-z0-9]+", (t or "").lower())
        for pos, tok in enumerate(toks):
            passages.setdefault((d, pos // ptok), {}).setdefault(tok, 0)
            passages[(d, pos // ptok)][tok] += 1
    n = len(passages)
    tot = sum(sum(tfs.values()) for tfs in passages.values())
    avgdl = tot / n
    df = {
        q: sum(1 for tfs in passages.values() if q in tfs) for q in terms
    }
    pscore = {}
    for (d, p), tfs in passages.items():
        dl = sum(tfs.values())
        s = 0.0
        hit = False
        for q in terms:
            tf = tfs.get(q, 0)
            if not tf:
                continue
            hit = True
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += round(
                idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)),
                6,
            )
        if hit:
            pscore[(d, p)] = round(s, 6)
    docs = {}
    for (d, p), s in pscore.items():
        cur = docs.get(d)
        if cur is None or (s, -p) > (cur[0], -cur[1]):
            docs[d] = (s, p)
    ranked = sorted(docs.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    return [
        (d, s, p, i + 1) for i, (d, (s, p)) in enumerate(ranked)
    ]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


TEXTS = [
    "solar panel efficiency gains in desert climates " * 2,
    # the relevant passage buried in a long diluted document
    ("filler words about municipal budgets and zoning " * 12)
    + " solar panel subsidy program details solar solar panel "
    + ("more filler about road maintenance schedules " * 12),
    "wind turbine maintenance with no relevant terms",
    None,
    "solar",
]


def test_matches_brute_force(spark):
    got = [
        (r["doc_id"], r["score_r"], r["best_p"], r["rank"])
        for r in ix.bm25_maxp_search(
            _docs(spark, TEXTS), "solar panel", k=5, passage_tokens=10
        ).collect()
    ]
    assert got == _brute(TEXTS, "solar panel", 5, 10)


def test_buried_passage_beats_dilution(spark):
    # whole-doc BM25 punishes doc 1's length; MaxP scores its best
    # 10-token window, which is denser in query terms than doc 0's.
    maxp = ix.bm25_maxp_search(
        _docs(spark, TEXTS), "solar panel subsidy", k=2, passage_tokens=10
    ).collect()
    assert maxp[0]["doc_id"] == 1
    plain = ix.bm25_search(_docs(spark, TEXTS), "solar panel subsidy", k=2)
    assert plain.collect()[0]["doc_id"] != 1


def test_best_p_lowest_on_tie(spark):
    # two identical passages -> identical scores; best_p must be 0
    txt = "alpha beta " + "x " * 8 + "alpha beta " + "y " * 8
    rows = ix.bm25_maxp_search(
        _docs(spark, [txt]), "alpha", k=1, passage_tokens=10
    ).collect()
    assert rows[0]["best_p"] == 0


def test_passage_postings_window_split(spark):
    rows = ix.passage_postings(
        _docs(spark, ["a b c d e f g"]), passage_tokens=3
    ).collect()
    got = {(r["p_idx"], r["term"]): r["tf"] for r in rows}
    assert got == {
        (0, "a"): 1, (0, "b"): 1, (0, "c"): 1,
        (1, "d"): 1, (1, "e"): 1, (1, "f"): 1,
        (2, "g"): 1,
    }


def test_validation(spark):
    df = _docs(spark, ["a"])
    with pytest.raises(ValueError):
        ix.bm25_maxp_search(df, "!!!", k=1)
    with pytest.raises(ValueError):
        ix.passage_postings(df, passage_tokens=0)


def test_no_nested_loop_plan(spark):
    plan = (
        ix.bm25_maxp_search(_docs(spark, TEXTS), "solar", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan
