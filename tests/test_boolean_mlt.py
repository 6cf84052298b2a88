"""Boolean retrieval (index.boolean_search) and MoreLikeThis tf-idf cosine
(index.more_like_this) — brute-force differentials."""

from __future__ import annotations

import math
import re

import pandas as pd
import pytest

from spider_spark.operators import index as ix

DOCS = [
    (0, "spark merges window data with spark"),
    (1, "window data processing guide"),
    (2, "spark tuning guide for shuffles"),
    (3, "data data data everywhere"),
    (4, "unrelated cooking recipes"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def _tok(s):
    return re.findall(r"[a-z0-9]+", s.lower())


def test_boolean_search_clauses(spark, docs):
    # must: spark AND guide → doc 2 only
    got = {r["doc_id"] for r in ix.boolean_search(docs, must=["spark", "guide"]).collect()}
    assert got == {2}
    # should: window OR cooking → 0, 1, 4
    got = {r["doc_id"] for r in ix.boolean_search(docs, should=["window", "cooking"]).collect()}
    assert got == {0, 1, 4}
    # must data, must_not window → 3 (0 and 1 have window)
    got = {
        r["doc_id"]
        for r in ix.boolean_search(docs, must=["data"], must_not=["window"]).collect()
    }
    assert got == {3}
    # must + should combined: must=data, should in (spark, guide) → 0, 1
    rows = {
        r["doc_id"]: (r["n_must"], r["n_should"])
        for r in ix.boolean_search(
            docs, must=["data"], should=["spark", "guide"]
        ).collect()
    }
    assert set(rows) == {0, 1}
    assert rows[0] == (1, 1) and rows[1] == (1, 1)


def test_boolean_search_validation(spark, docs):
    with pytest.raises(ValueError):
        ix.boolean_search(docs, must_not=["spark"])  # pure negation refused
    with pytest.raises(ValueError):
        ix.boolean_search(docs, must=["a"], must_not=["a"])


def _brute_mlt(source, max_df_frac=1.0):
    n = len(DOCS)
    tf = {}
    df = {}
    for d, text in DOCS:
        toks = _tok(text)
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
        for t in toks:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    w = {k: c * math.log(1 + n / df[k[1]]) for k, c in tf.items()}
    norm = {}
    for (d, t), v in w.items():
        norm[d] = norm.get(d, 0.0) + v * v
    norm = {d: math.sqrt(v) for d, v in norm.items()}
    src_terms = {
        t: w[(source, t)]
        for (d, t) in w
        if d == source and df[t] <= n * max_df_frac
    }
    out = {}
    for (d, t), v in w.items():
        if d != source and t in src_terms:
            out[d] = out.get(d, 0.0) + v * src_terms[t]
    return {
        d: round(dot / (norm[d] * norm[source]), 6) for d, dot in out.items()
    }


def test_more_like_this_matches_bruteforce(spark, docs):
    got = {
        r["doc_id"]: r["cosine_r"]
        for r in ix.more_like_this(docs, 0, k=10, max_df_frac=1.0).collect()
    }
    want = _brute_mlt(0, max_df_frac=1.0)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=2e-6)
    # source never ranks itself
    assert 0 not in got


def test_more_like_this_stop_term_screen(spark, docs):
    """'data' appears in 3/5 docs; with max_df_frac=0.5 it's screened, so
    doc 3 (shares ONLY 'data' with doc 0) drops out of the candidates."""
    with_stop = {
        r["doc_id"] for r in ix.more_like_this(docs, 0, max_df_frac=1.0).collect()
    }
    screened = {
        r["doc_id"] for r in ix.more_like_this(docs, 0, max_df_frac=0.5).collect()
    }
    assert 3 in with_stop and 3 not in screened
    # the screen matches brute force too
    got = {
        r["doc_id"]: r["cosine_r"]
        for r in ix.more_like_this(docs, 0, max_df_frac=0.5).collect()
    }
    want = _brute_mlt(0, max_df_frac=0.5)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=2e-6)


def test_more_like_this_validation(spark, docs):
    with pytest.raises(ValueError):
        ix.more_like_this(docs, 0, k=0)
    with pytest.raises(ValueError):
        ix.more_like_this(docs, 0, max_df_frac=0.0)
    # unknown source doc → empty result, not an error
    assert ix.more_like_this(docs, 999).collect() == []
