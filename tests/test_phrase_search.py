"""Positional index + exact phrase queries (operators/index.py)."""

from __future__ import annotations

import re

import pytest

from spider_spark.operators import index as ix


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(texts, phrase):
    terms = re.findall(r"[a-z0-9]+", phrase.lower())
    out = {}
    for i, t in enumerate(texts):
        toks = re.findall(r"[a-z0-9]+", (t or "").lower())
        n = sum(
            1
            for j in range(len(toks) - len(terms) + 1)
            if toks[j : j + len(terms)] == terms
        )
        if n:
            out[i] = n
    return out


def test_positional_postings_positions(spark):
    rows = ix.positional_postings(_docs(spark, ["Big fast BIG"])).collect()
    got = {(r["term"], r["pos"]) for r in rows}
    assert got == {("big", 0), ("fast", 1), ("big", 2)}


def test_phrase_counts_and_order(spark):
    texts = [
        "the quick fox and the quick fox again",  # 2 matches
        "quick the fox",  # reversed order: none
        "the quick brown fox",  # 1 for "the quick"
        None,
    ]
    got = {
        r["doc_id"]: r["matches"]
        for r in ix.phrase_search(_docs(spark, texts), "the quick").collect()
    }
    assert got == {0: 2, 2: 1}


def test_phrase_overlapping_matches(spark):
    got = {
        r["doc_id"]: r["matches"]
        for r in ix.phrase_search(_docs(spark, ["a a a a"]), "a a").collect()
    }
    assert got == {0: 3}


def test_phrase_case_and_punctuation_folding(spark):
    texts = ["Hello, World! hello world."]
    got = {
        r["doc_id"]: r["matches"]
        for r in ix.phrase_search(_docs(spark, texts), "Hello WORLD").collect()
    }
    assert got == {0: 2}


def test_single_term_phrase_is_tf(spark):
    got = {
        r["doc_id"]: r["matches"]
        for r in ix.phrase_search(_docs(spark, ["x y x z x"]), "x").collect()
    }
    assert got == {0: 3}


def test_phrase_differential_vs_bruteforce(spark):
    vocab = "table part fast value scan row agg the a".split()
    texts = []
    x = 17
    for _ in range(40):
        words = []
        for _ in range(30):
            x = (x * 1103515245 + 12345) % (2**31)
            words.append(vocab[x % len(vocab)])
        texts.append(" ".join(words))
    df = _docs(spark, texts)
    for phrase in ("table part", "fast value scan", "a a", "the"):
        want = _brute(texts, phrase)
        got = {
            r["doc_id"]: r["matches"]
            for r in ix.phrase_search(df, phrase).collect()
        }
        assert got == want, phrase


def test_phrase_rejects_empty(spark):
    with pytest.raises(ValueError):
        ix.phrase_search(_docs(spark, ["x"]), "!!!")
