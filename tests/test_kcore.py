"""k-core peeling (graph.kcore_survivors) and dictionary front-coding
(index.dictionary_frontcoding_stats)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import graph
from spider_spark.operators import index as ix


def _edges(spark, pairs):
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))


def test_kcore_strips_periphery_keeps_clique(spark):
    # K4 clique (every node degree 3) + a chain hanging off it
    pairs = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "f"), ("f", "g"),
    ]
    got = {
        r["node"] for r in graph.kcore_survivors(_edges(spark, pairs), k=3).collect()
    }
    assert got == {"a", "b", "c", "d"}
    # k=2: chain still peels (its ends keep falling below 2)
    got2 = {
        r["node"] for r in graph.kcore_survivors(_edges(spark, pairs), k=2).collect()
    }
    assert got2 == {"a", "b", "c", "d"}


def test_kcore_cascade_needs_multiple_rounds(spark):
    # a path a-b-c-d-e at k=2 unravels one end per round → empty
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    got = graph.kcore_survivors(_edges(spark, pairs), k=2, rounds=6).collect()
    assert got == []
    # a cycle is its own 2-core
    cyc = [("a", "b"), ("b", "c"), ("c", "a")]
    got2 = {r["node"] for r in graph.kcore_survivors(_edges(spark, cyc), k=2).collect()}
    assert got2 == {"a", "b", "c"}


def test_kcore_ignores_direction_self_loops_and_dupes(spark):
    pairs = [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("c", "a")]
    # undirected distinct: triangle a-b-c
    got = {r["node"] for r in graph.kcore_survivors(_edges(spark, pairs), k=2).collect()}
    assert got == {"a", "b", "c"}
    with pytest.raises(ValueError):
        graph.kcore_survivors(_edges(spark, pairs), k=0)
    with pytest.raises(ValueError):
        graph.kcore_survivors(_edges(spark, pairs), k=1, rounds=0)


def _brute_frontcoding(texts, bucket_chars=2):
    import re
    from collections import defaultdict

    vocab = sorted({t for s in texts for t in re.findall(r"[a-z0-9]+", s.lower())})
    buckets = defaultdict(list)
    for t in vocab:
        buckets[t[:bucket_chars]].append(t)
    raw = sum(len(t) + 1 for t in vocab)
    coded = 0
    for b, terms in buckets.items():
        prev = ""
        for t in sorted(terms):
            cpl = 0
            if prev:
                while (
                    cpl < min(len(t), len(prev)) and t[cpl] == prev[cpl]
                ):
                    cpl += 1
            coded += len(t) - cpl + 2
            prev = t
    return len(vocab), raw, coded


def test_frontcoding_matches_bruteforce(spark):
    texts = [
        "interchange interchangeable interest interesting internal",
        "spark sparks sparse sparta zebra zoo",
        "aa ab interchange",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = ix.dictionary_frontcoding_stats(df, bucket_chars=2).collect()[0]
    n, raw, coded = _brute_frontcoding(texts, 2)
    assert got["n_terms"] == n
    assert got["raw_bytes"] == raw
    assert got["coded_bytes"] == coded
    assert got["saved_bytes"] == raw - coded
    # prefix-heavy vocab must actually save
    assert got["coded_bytes"] < got["raw_bytes"]
    with pytest.raises(ValueError):
        ix.dictionary_frontcoding_stats(df, bucket_chars=0)
