"""OPIC importance (graph.opic) and inverted index / TF-IDF
(operators/index.py): hand-computed differentials plus the invariants
each algorithm is defined by (cash conservation; every-posting-counted)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import graph, index


# ---------------------------------------------------------------------------
# OPIC
# ---------------------------------------------------------------------------


def _opic_py(edges, iters):
    """Literal restatement of the sweep for a tiny graph."""
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    cash = {n: 1.0 for n in nodes}
    hist = {n: 0.0 for n in nodes}
    for _ in range(iters):
        dang = sum(c for n, c in cash.items() if n not in out)
        incoming = {n: 0.0 for n in nodes}
        for s, ds in out.items():
            for d in ds:
                incoming[d] += cash[s] / len(ds)
        for n in nodes:
            hist[n] += cash[n]
        cash = {n: incoming[n] + dang / len(nodes) for n in nodes}
    return {n: hist[n] + cash[n] for n in nodes}


EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a")]  # c is dangling


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_opic_matches_python_reference(spark, edges_df, iters):
    got = {r.node: r.importance for r in graph.opic(edges_df, iters=iters).collect()}
    want = _opic_py(EDGES, iters)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], rel=1e-12), n


def test_opic_cash_conserved_and_history_grows(spark, edges_df):
    rows = graph.opic(edges_df, iters=3).collect()
    n = len(rows)
    assert sum(r.cash for r in rows) == pytest.approx(n, rel=1e-12)
    assert sum(r.hist for r in rows) == pytest.approx(3 * n, rel=1e-12)


def test_opic_no_nested_loop_plan(spark, edges_df):
    plan = (
        graph.opic(edges_df, iters=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# inverted index / TF-IDF
# ---------------------------------------------------------------------------

DOCS = [
    (1, "Spark spark SPARK crawl"),
    (2, "crawl the web, crawl it all"),
    (3, "unrelated   words only"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_postings_counts_and_case_fold(spark, docs_df):
    post = {(r.term, r.doc_id): r.tf for r in index.postings(docs_df).collect()}
    assert post[("spark", 1)] == 3
    assert post[("crawl", 2)] == 2
    assert post[("crawl", 1)] == 1
    assert ("the", 2) in post and ("it", 2) in post


def test_postings_total_equals_token_count(spark, docs_df):
    total = index.postings(docs_df).agg(F.sum("tf")).collect()[0][0]
    toks = docs_df.select(
        F.explode(index.col_index_tokens("text"))
    ).count()
    assert total == toks


def test_tfidf_hand_computed(spark, docs_df):
    got = {
        (r.doc_id, r.term): (r.tfidf_r, r.rank)
        for r in index.tfidf_top_terms(docs_df, k=10).collect()
    }
    n = 3
    # 'spark' appears in 1 doc, tf 3 in doc 1
    want = round(3 * (math.log((n + 1) / (1 + 1)) + 1), 6)
    assert got[(1, "spark")][0] == pytest.approx(want)
    assert got[(1, "spark")][1] == 1  # highest-scoring term of doc 1
    # 'crawl' in 2 docs
    want_c = round(2 * (math.log((n + 1) / (2 + 1)) + 1), 6)
    assert got[(2, "crawl")][0] == pytest.approx(want_c)


def test_topk_cap_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "b a c d e f g h")], "doc_id long, text string"
    )
    rows = index.tfidf_top_terms(docs, k=3).collect()
    assert len(rows) == 3
    # all terms tie (tf=1, df=1) -> lexicographic order wins
    assert [r.term for r in sorted(rows, key=lambda r: r.rank)] == ["a", "b", "c"]


def test_null_text_yields_no_postings(spark):
    docs = spark.createDataFrame([(1, None), (2, "x")], "doc_id long, text string")
    assert index.postings(docs).where(F.col("doc_id") == 1).count() == 0


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def _bm25_py(docs, k1=1.2, b=0.75):
    """Literal restatement of the Lucene-idf BM25 formula."""
    import re

    toks = {i: re.findall(r"[a-z0-9]+", (t or "").lower()) for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for i, ts in toks.items():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for i, ts in toks.items():
        dl = len(ts)
        for t in set(ts):
            tf = ts.count(t)
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            out[(i, t)] = round(
                idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6
            )
    return out


def test_bm25_scores_hand_computed(spark, docs_df):
    got = {(r.doc_id, r.term): r.bm25_r for r in index.bm25_scores(docs_df).collect()}
    want = _bm25_py(DOCS)
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=2e-6), key


def test_bm25_tf_saturates(spark):
    # BM25's defining property over TF-IDF: repeated terms saturate
    docs = spark.createDataFrame(
        [(1, "x " * 50 + "pad"), (2, "x pad pad " + "filler " * 48)],
        "doc_id long, text string",
    )
    s = {
        (r.doc_id, r.term): r.bm25_r
        for r in index.bm25_scores(docs).collect()
    }
    # tf 50 scores more than tf 1, but nowhere near 50x
    assert s[(1, "x")] > s[(2, "x")]
    assert s[(1, "x")] < 5 * s[(2, "x")]


def test_bm25_search_ranks_and_caps(spark, docs_df):
    rows = index.bm25_search(docs_df, "Spark CRAWL!", k=2).collect()
    assert len(rows) == 2
    by_rank = sorted(rows, key=lambda r: r.rank)
    # doc 1 has spark(tf3)+crawl; doc 2 only crawl -> doc 1 first
    assert by_rank[0].doc_id == 1 and by_rank[1].doc_id == 2
    want = _bm25_py(DOCS)
    assert by_rank[0].score_r == pytest.approx(
        round(want[(1, "spark")] + want[(1, "crawl")], 6), abs=3e-6
    )


def test_bm25_search_topk_plan_has_no_global_window_sort(spark, docs_df):
    plan = (
        index.bm25_search(docs_df, "spark", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_bm25_search_rejects_empty_query(spark, docs_df):
    with pytest.raises(ValueError):
        index.bm25_search(docs_df, "!!! ???")


# ---------------------------------------------------------------------------
# incremental postings maintenance
# ---------------------------------------------------------------------------


def _post_set(df):
    return {(r.term, r.doc_id, r.tf) for r in df.collect()}


def test_merge_postings_equals_full_rebuild(spark, docs_df):
    """The defining invariant: incremental merge == full rebuild of the
    corpus with delta texts substituted and deletions removed."""
    old = index.postings(docs_df)
    delta = spark.createDataFrame(
        [(2, "fresh crawl content"), (4, "brand new page")],
        "doc_id long, text string",
    )
    deleted = spark.createDataFrame([(3,)], "doc_id long")
    merged = index.merge_postings(old, delta, deleted)
    final = spark.createDataFrame(
        [(1, DOCS[0][1]), (2, "fresh crawl content"), (4, "brand new page")],
        "doc_id long, text string",
    )
    assert _post_set(merged) == _post_set(index.postings(final))


def test_merge_postings_delete_beats_refresh(spark, docs_df):
    old = index.postings(docs_df)
    delta = spark.createDataFrame([(2, "zombie text")], "doc_id long, text string")
    deleted = spark.createDataFrame([(2,)], "doc_id long")
    merged = index.merge_postings(old, delta, deleted)
    assert merged.where(F.col("doc_id") == 2).count() == 0


def test_merge_postings_no_deletes(spark, docs_df):
    old = index.postings(docs_df)
    delta = spark.createDataFrame([(1, "replaced")], "doc_id long, text string")
    merged = index.merge_postings(old, delta)
    got = {(r.term, r.tf) for r in merged.where(F.col("doc_id") == 1).collect()}
    assert got == {("replaced", 1)}
