"""CORI shard selection (index.shard_term_stats + cori_shard_scores)."""

from __future__ import annotations

import math
import re

import pandas as pd
import pytest

from spider_spark.operators import index as ix

# shard A is the 'zebra' shard, B generic, C off-topic
DOCS = [
    ("A", 0, "zebra stripes zebra habitat"),
    ("A", 1, "zebra migration patterns"),
    ("A", 2, "savanna zebra herds"),
    ("B", 3, "general animal encyclopedia zebra entry"),
    ("B", 4, "animal diets and habitats"),
    ("C", 5, "stock market analysis"),
    ("C", 6, "quarterly earnings report"),
]


@pytest.fixture(scope="module")
def stats(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["shard", "doc_id", "text"])
    )
    return ix.shard_term_stats(docs)


def _brute_cori(query, b=0.4):
    terms = sorted(set(re.findall(r"[a-z0-9]+", query.lower())))
    per_shard_docs = {}
    for s, d, t in DOCS:
        per_shard_docs.setdefault(s, []).append(re.findall(r"[a-z0-9]+", t.lower()))
    df = {}
    cw = {}
    for s, docs in per_shard_docs.items():
        cw[s] = sum(len(d) for d in docs)
        for t in {t for d in docs for t in d}:
            df[(s, t)] = sum(1 for d in docs if t in d)
    shards = sorted(per_shard_docs)
    avg_cw = sum(cw.values()) / len(shards)
    scores = {}
    for s in shards:
        total = 0.0
        for t in terms:
            d = df.get((s, t), 0)
            if d == 0:
                total += b
                continue
            cf = sum(1 for s2 in shards if df.get((s2, t), 0) > 0)
            T = d / (d + 50 + 150 * cw[s] / avg_cw)
            I = math.log((len(shards) + 0.5) / cf) / math.log(len(shards) + 1)
            total += b + (1 - b) * T * I
        scores[s] = round(total / len(terms), 6)
    return scores


def test_stats_census(spark, stats):
    rows = {(r["shard"], r["term"]): (r["df"], r["cw"]) for r in stats.collect()}
    assert rows[("A", "zebra")] == (3, 10)  # 3 docs, 10 tokens in shard A
    assert rows[("B", "zebra")][0] == 1
    assert ("C", "zebra") not in rows


def test_cori_matches_bruteforce(spark, stats):
    for q in ("zebra habitat", "zebra", "earnings zebra"):
        got = {r["shard"]: r["score_r"] for r in ix.cori_shard_scores(stats, q).collect()}
        want = _brute_cori(q)
        assert set(got) == set(want)
        for s in want:
            assert got[s] == pytest.approx(want[s], abs=2e-6), (q, s)


def test_cori_routes_to_the_topical_shard(spark, stats):
    ranked = ix.cori_shard_scores(stats, "zebra habitat").collect()
    assert ranked[0]["shard"] == "A" and ranked[0]["rank"] == 1
    assert ranked[-1]["shard"] == "C"  # off-topic shard last (default belief)
    # every shard scored even when it lacks every query term
    assert len(ranked) == 3


def test_cori_validation(spark, stats):
    with pytest.raises(ValueError):
        ix.cori_shard_scores(stats, "???")
    with pytest.raises(ValueError):
        ix.cori_shard_scores(stats, "zebra", b=1.0)
