"""Prospective search / standing-query percolation (index.percolate)."""

from __future__ import annotations

from spider_spark.operators import index as ix


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _queries(spark, qs):
    return spark.createDataFrame(
        [(i, q) for i, q in enumerate(qs)], "query_id long, query string"
    )


def _run(spark, texts, qs):
    return {
        (r["doc_id"], r["query_id"]): r["n_terms"]
        for r in ix.percolate(_docs(spark, texts), _queries(spark, qs)).collect()
    }


def test_conjunctive_all_terms_required(spark):
    texts = ["fox jumps over", "fox sleeps", "jumps alone"]
    qs = ["fox jumps", "fox", "missing term"]
    got = _run(spark, texts, qs)
    assert got == {
        (0, 0): 2,  # has both fox and jumps
        (0, 1): 1,
        (1, 1): 1,
    }


def test_term_multiplicity_does_not_fake_conjunction(spark):
    # doc says "fox fox" but query needs fox AND den
    got = _run(spark, ["fox fox"], ["fox den"])
    assert got == {}


def test_duplicate_query_terms_collapse(spark):
    # "fox fox" as a query is the same conjunction as "fox"
    got = _run(spark, ["a fox here"], ["fox fox"])
    assert got == {(0, 0): 1}


def test_case_and_punctuation_folding(spark):
    got = _run(spark, ["Hello, World!"], ["hello WORLD"])
    assert got == {(0, 0): 2}


def test_empty_query_never_matches(spark):
    got = _run(spark, ["anything"], ["!!!", ""])
    assert got == {}
