"""BM25F field-weighted search (index.bm25f_search) — literal-formula
differential and the anchor-boost behavior the operator exists for."""

from __future__ import annotations

import math
import re

import pandas as pd
import pytest

from spider_spark.operators import index as ix


DOCS = [
    (0, "spark merges windows fast", "external anchor"),
    (1, "the quick brown fox jumps", "spark window"),  # query only in anchor
    (2, "spark spark spark filler filler", ""),
    (3, "window functions in sql", "spark tutorial"),
    (4, "unrelated text entirely here", None),
]
FIELDS = [("text", 1.0, 0.75), ("anchor_text", 2.0, 0.75)]


def _tok(s):
    return re.findall(r"[a-z0-9]+", (s or "").lower())


def _brute(query, k1=1.2):
    terms = sorted(set(_tok(query)))
    n = len(DOCS)
    field_cols = {"text": 1, "anchor_text": 2}
    # per-field stats
    avgl = {}
    for f, ci in field_cols.items():
        avgl[f] = sum(len(_tok(d[ci])) for d in DOCS) / n
    pseudo = {}
    for doc in DOCS:
        for (f, w, b), ci in zip(FIELDS, (1, 2)):
            toks = _tok(doc[ci])
            bf = 1 - b + b * len(toks) / avgl[f]
            for t in terms:
                tf = toks.count(t)
                if tf:
                    pseudo[(doc[0], t)] = pseudo.get((doc[0], t), 0.0) + w * tf / bf
    df = {}
    for (d, t), v in pseudo.items():
        df[t] = df.get(t, 0) + 1
    scores = {}
    for (d, t), tft in pseudo.items():
        idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
        scores[d] = scores.get(d, 0.0) + idf * tft / (k1 + tft)
    return {d: round(s, 6) for d, s in scores.items()}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text", "anchor_text"])
    )


def test_bm25f_matches_literal_formula(spark, docs):
    for query in ("spark window", "spark", "window fox"):
        got = {
            r["doc_id"]: r["score_r"]
            for r in ix.bm25f_search(docs, query, FIELDS, k=10).collect()
        }
        want = _brute(query)
        assert set(got) == set(want), query
        for d in want:
            assert got[d] == pytest.approx(want[d], abs=2e-6), (query, d)


def test_anchor_boost_outranks_body_only(spark, docs):
    """doc 1 matches 'spark window' ONLY via its 2×-weighted anchor and
    must outrank doc 2's body-only spam repetition — saturation caps the
    repeated body term while the anchor contributes both terms."""
    ranks = {
        r["doc_id"]: r["rank"]
        for r in ix.bm25f_search(docs, "spark window", FIELDS, k=10).collect()
    }
    assert ranks[1] < ranks[2]


def test_bm25f_rank_determinism_and_k(spark, docs):
    top2 = ix.bm25f_search(docs, "spark window", FIELDS, k=2).collect()
    assert [r["rank"] for r in top2] == [1, 2]
    full = ix.bm25f_search(docs, "spark window", FIELDS, k=10).collect()
    assert [(r["doc_id"], r["score_r"]) for r in top2] == [
        (r["doc_id"], r["score_r"]) for r in full[:2]
    ]


def test_bm25f_validation(spark, docs):
    with pytest.raises(ValueError):
        ix.bm25f_search(docs, "!!!", FIELDS)
    with pytest.raises(ValueError):
        ix.bm25f_search(docs, "spark", [])
