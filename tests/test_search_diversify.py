"""Host-collapsed search results (index.bm25_search_diversified)."""

from __future__ import annotations

import pytest

from spider_spark.operators import index as ix


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, host string, text string"
    )


def _run(spark, rows, query, **kw):
    return [
        (r["doc_id"], r["host"], r["host_rank"], r["rank"])
        for r in ix.bm25_search_diversified(_docs(spark, rows), query, **kw)
        .orderBy("rank")
        .collect()
    ]


def test_host_cap_collapses_dominant_host(spark):
    # host a has the 3 strongest docs; per_host=2 lets host b's weaker
    # doc into the top 3
    rows = [
        (1, "a", "fox fox fox fox"),
        (2, "a", "fox fox fox pad"),
        (3, "a", "fox fox pad pad"),
        (4, "b", "fox pad pad pad"),
        (5, "c", "pad pad pad pad"),
    ]
    got = _run(spark, rows, "fox", k=3, per_host=2)
    assert [(g[0], g[1]) for g in got] == [(1, "a"), (2, "a"), (4, "b")]
    assert [g[2] for g in got] == [1, 2, 1]  # host_rank
    assert [g[3] for g in got] == [1, 2, 3]  # global rank


def test_per_host_one_is_strict_site_collapse(spark):
    rows = [
        (1, "a", "fox fox fox"),
        (2, "a", "fox fox pad"),
        (3, "b", "fox pad pad"),
    ]
    got = _run(spark, rows, "fox", k=10, per_host=1)
    assert [(g[0], g[1]) for g in got] == [(1, "a"), (3, "b")]


def test_non_matching_docs_absent_and_k_truncates(spark):
    rows = [(i, f"h{i}", "fox") for i in range(5)] + [(9, "z", "pad")]
    got = _run(spark, rows, "fox", k=3, per_host=2)
    assert len(got) == 3
    assert all(g[0] != 9 for g in got)


def test_matches_plain_bm25_when_cap_inactive(spark):
    rows = [
        (1, "a", "fox fox pad"),
        (2, "b", "fox pad pad"),
        (3, "c", "fox fox fox"),
    ]
    plain = {
        r["doc_id"]: r["rank"]
        for r in ix.bm25_search(
            _docs(spark, rows).select("doc_id", "text"), "fox", k=10
        ).collect()
    }
    div = {g[0]: g[3] for g in _run(spark, rows, "fox", k=10, per_host=5)}
    assert div == plain


def test_salt_invariance(spark):
    rows = [(i, f"h{i % 3}", "fox " * (i % 4 + 1)) for i in range(20)]
    a = _run(spark, rows, "fox", k=6, per_host=2, salt=1)
    c = _run(spark, rows, "fox", k=6, per_host=2, salt=64)
    assert a == c


def test_rejects_bad_inputs(spark):
    df = _docs(spark, [(1, "a", "x")])
    with pytest.raises(ValueError):
        ix.bm25_search_diversified(df, "x", k=0)
    with pytest.raises(ValueError):
        ix.bm25_search_diversified(df, "x", per_host=0)
