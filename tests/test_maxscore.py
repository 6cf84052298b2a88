"""MaxScore/WAND pruned top-k (index.maxscore_topk).

The contract is EQUALITY with bm25_search — pruning is an optimization,
never a result change — plus evidence the prune actually prunes on the
workload it exists for (rare term OR'd with stopword-ish ones).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import index as ix


@pytest.fixture(scope="module")
def corpus(spark):
    # 400 docs: 'common' everywhere, 'filler' on most, 'zebra' on 5 docs
    # with varying tf so single-term contributions differ
    rows = []
    for i in range(400):
        words = ["common"] * (1 + i % 3)
        if i % 4 != 0:
            words += ["filler"] * (1 + i % 2)
        if i in (7, 30, 77, 130, 255):
            words += ["zebra"] * (1 + i % 4)
        words += [f"noise{i % 50}"]
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).repartition(4)


@pytest.mark.parametrize(
    "query,k",
    [
        ("zebra common", 5),
        ("zebra filler common", 3),
        ("common", 10),
        ("zebra", 8),  # fewer matches than k on the rare term
        ("absent zebra", 4),  # term with no postings
        ("totallyabsent", 3),  # nothing matches at all
    ],
)
def test_maxscore_equals_exact_bm25(spark, corpus, query, k):
    got = ix.maxscore_topk(corpus, query, k=k).collect()
    if query == "totallyabsent":
        assert got == []
        return
    want = ix.bm25_search(corpus, query, k=k).collect()
    assert [(r["doc_id"], r["score_r"], r["rank"]) for r in got] == [
        (r["doc_id"], r["score_r"], r["rank"]) for r in want
    ]


def test_maxscore_prunes_the_or_query(spark, corpus):
    """'zebra common': θ seeded from zebra's 5 docs exceeds common's
    ub·matched sum for common-only docs → candidates collapse to the
    zebra postings instead of all 400 matching docs."""
    query, k = "zebra common", 5
    terms = ["zebra", "common"]
    scores_q = ix.bm25_scores(corpus).where(F.col("term").isin(terms))
    ub = {
        r["term"]: r["ub"]
        for r in ix.bm25_term_upper_bounds(scores_q).collect()
    }
    # the workload premise: the rare term towers over the common one
    assert ub["zebra"] > ub["common"]
    # θ = k-th exact score among zebra-seeded docs; every zebra doc also
    # has 'common', so θ > ub['common'] ⇒ 'common' alone is non-essential
    seed = (
        scores_q.where(F.col("term") == "zebra")
        .orderBy(F.col("bm25_r").desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id")
    )
    theta = sorted(
        (
            r["s"]
            for r in scores_q.join(seed, "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(F.round(F.sum("bm25_r"), 6).alias("s"))
            .collect()
        ),
        reverse=True,
    )[k - 1]
    assert ub["common"] < theta - 1e-5  # 'common' is provably non-essential
    # and the pruned result still equals the exact ranking (the contract)
    got = ix.maxscore_topk(corpus, query, k=k).collect()
    assert {r["doc_id"] for r in got} <= {7, 30, 77, 130, 255}


def test_maxscore_validates_inputs(spark, corpus):
    with pytest.raises(ValueError):
        ix.maxscore_topk(corpus, "!!!", k=5)
    with pytest.raises(ValueError):
        ix.maxscore_topk(corpus, "zebra", k=0)


def test_upper_bounds_census(spark, corpus):
    scores = ix.bm25_scores(corpus)
    ub = {r["term"]: r["ub"] for r in ix.bm25_term_upper_bounds(scores).collect()}
    brute = {}
    for r in scores.collect():
        brute[r["term"]] = max(brute.get(r["term"], 0.0), r["bm25_r"])
    assert ub == brute


def test_batch_topk_equals_per_query(spark, corpus):
    import pandas as pd

    queries = pd.DataFrame(
        {"query_id": [1, 2, 3], "q": ["zebra common", "filler", "common zebra filler"]}
    )
    scores = ix.bm25_scores(corpus)
    batch = ix.batch_bm25_topk(scores, spark.createDataFrame(queries), k=5)
    rows = batch.collect()
    for qid, q in zip(queries["query_id"], queries["q"]):
        got = sorted(
            (r["rank"], r["doc_id"], r["score_r"])
            for r in rows
            if r["query_id"] == qid
        )
        want = [
            (r["rank"], r["doc_id"], r["score_r"])
            for r in ix.bm25_search(corpus, q, k=5).collect()
        ]
        assert got == want, q
    with pytest.raises(ValueError):
        ix.batch_bm25_topk(scores, spark.createDataFrame(queries), k=0)
