"""Query-biased snippets (operators/index.py query_snippets)."""

from __future__ import annotations

import re

import pytest

from spider_spark.operators import index as ix


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(texts, query, window):
    qt = set(re.findall(r"[a-z0-9]+", query.lower()))
    out = {}
    for i, t in enumerate(texts):
        toks = re.findall(r"[a-z0-9]+", (t or "").lower())
        starts = [p for p, tok in enumerate(toks) if tok in qt]
        if not starts:
            continue
        best = None
        for s in starts:
            n = len({tok for tok in toks[s : s + window] if tok in qt})
            if best is None or (-n, s) < best[0]:
                best = ((-n, s), s, n)
        _, s, n = best
        out[i] = (s, n, " ".join(toks[s : s + window]))
    return out


def _run(spark, texts, query, window=10):
    return {
        r["doc_id"]: (r["start"], r["n_terms"], r["snippet"])
        for r in ix.query_snippets(_docs(spark, texts), query, window).collect()
    }


def test_coverage_beats_repetition(spark):
    # the window holding BOTH terms wins over the earlier single-term one
    texts = ["fox fox fox pad pad pad pad pad pad pad pad fox quick end"]
    got = _run(spark, texts, "quick fox", window=3)
    assert got == {0: (11, 2, "fox quick end")}


def test_earliest_start_breaks_ties(spark):
    texts = ["fox a b c d e f g h i fox z"]
    got = _run(spark, texts, "fox", window=2)
    assert got == {0: (0, 1, "fox a")}


def test_window_truncates_at_doc_end(spark):
    got = _run(spark, ["alpha beta fox"], "fox", window=5)
    assert got == {0: (2, 1, "fox")}


def test_non_matching_and_null_docs_absent(spark):
    got = _run(spark, ["nothing here", None, "the fox runs"], "fox")
    assert set(got) == {2}
    assert got[2] == (1, 1, "fox runs")


def test_normalizes_case_and_punctuation(spark):
    got = _run(spark, ["Hello, World! FOX den."], "fox", window=2)
    assert got == {0: (2, 1, "fox den")}


def test_differential_vs_bruteforce(spark):
    vocab = "table part fast value scan row agg the a pad".split()
    texts, x = [], 29
    for _ in range(40):
        words = []
        for _ in range(35):
            x = (x * 1103515245 + 12345) % (2**31)
            words.append(vocab[x % len(vocab)])
        texts.append(" ".join(words))
    df = _docs(spark, texts)
    for query, window in (("table part", 8), ("fast scan value", 5), ("agg", 1)):
        want = _brute(texts, query, window)
        got = {
            r["doc_id"]: (r["start"], r["n_terms"], r["snippet"])
            for r in ix.query_snippets(df, query, window).collect()
        }
        assert got == want, (query, window)


def test_rejects_bad_inputs(spark):
    df = _docs(spark, ["x"])
    with pytest.raises(ValueError):
        ix.query_snippets(df, "!!!")
    with pytest.raises(ValueError):
        ix.query_snippets(df, "x", window=0)
