"""LSH recall asserted against the exact baselines (VERDICT r02 next #2):
a banding-parameter regression in any approximate near-dup operator now
fails CI. Mirrors the reference's differential discipline — same input
through two paths must agree (src/index.spec.ts:70-99) — with 'agree'
quantified as a recall floor against the exact ground truth."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import dedup, similarity


def _recall(spark, approx, exact) -> tuple[int, float]:
    row = dedup.pair_recall(approx, exact).collect()[0]
    return row.n_exact, float(row.recall)


@pytest.fixture(scope="module")
def planted_docs(spark):
    """40 mutually-dissimilar base docs (disjoint vocabularies) + a
    near-copy of every 4th one (one token of 30 replaced → 3-gram jaccard
    ≈ 0.82) + 3 exact copies. Ground truth at threshold 0.5 is exactly the
    planted pairs."""
    rows = []
    for i in range(40):
        toks = [f"w{i}x{j}" for j in range(30)]
        rows.append((i, " ".join(toks)))
        if i % 4 == 0:
            near = list(toks)
            near[15] = "CHANGED"
            rows.append((1000 + i, " ".join(near)))
        if i % 13 == 0:
            rows.append((2000 + i, " ".join(toks)))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _exact_jaccard_pairs(docs, threshold=0.5):
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("text_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return dedup.ngram_jaccard(pairs).filter(F.col("jaccard") >= threshold)


def test_minhash_recall_floor(spark, planted_docs):
    exact = _exact_jaccard_pairs(planted_docs, 0.5)
    approx = dedup.minhash_near_duplicates(planted_docs, jaccard_threshold=0.5)
    n_exact, recall = _recall(spark, approx, exact)
    assert n_exact >= 13  # the plant actually planted
    assert recall >= 0.9


def test_minhash_recall_detects_banding_regression(spark, planted_docs):
    """The failure the floor exists to catch: collapsing 64 perms into 2
    bands of 32 rows makes a 0.82-jaccard pair nearly undetectable
    (2 · 0.82^32 ≈ 0.003) — recall must visibly crater, proving the metric
    is sensitive to banding parameters, not vacuously high."""
    exact = _exact_jaccard_pairs(planted_docs, 0.5)
    bad = dedup.minhash_near_duplicates(
        planted_docs, jaccard_threshold=0.5, bands=2, num_perm=64
    )
    _, recall = _recall(spark, bad, exact)
    assert recall < 0.9


def test_simhash_recall_is_exact_by_pigeonhole(spark, planted_docs):
    """4×16-bit chunk banding is EXACT for hamming ≤ 3 (any such pair
    shares ≥1 chunk): recall vs brute-force hamming must be 1.0 whenever
    no hot bucket is dropped."""
    sh = planted_docs.select(
        "doc_id", dedup.simhash_udf()(F.col("text")).alias("simhash")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"))
    exact = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= 3)
    )
    approx = dedup.simhash_near_duplicates(planted_docs, max_hamming=3)
    n_exact, recall = _recall(spark, approx, exact)
    assert n_exact >= 3  # the exact copies at least
    assert recall == 1.0


def test_embedding_lsh_recall_floor(spark):
    rng = np.random.RandomState(5)
    base = rng.standard_normal((60, 32)).astype("float64")
    rows = [(i, base[i].tolist()) for i in range(60)]
    for i in range(0, 60, 3):  # 20 planted near-dups (tiny perturbation)
        v = base[i].copy()
        v[0] += 0.01
        rows.append((1000 + i, v.tolist()))
    emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    exact = similarity.exact_near_duplicates(emb, cosine_threshold=0.95)
    approx = similarity.embedding_near_duplicates(emb, dim=32, cosine_threshold=0.95)
    n_exact, recall = _recall(spark, approx, exact)
    assert n_exact >= 20
    assert recall >= 0.9


def test_truncation_recall_curve_planted(spark):
    from spider_spark.operators.similarity import truncation_recall_curve

    corpus = spark.createDataFrame(
        [
            (10, [1.0, 1.0, 0.0, 0.0]),   # A: exact match at every dim
            (11, [1.0, 1.0, 1.0, 1.0]),   # B: ties A on the 2-dim prefix,
                                          #    full-dim cos only .707
            (12, [-1.0, -1.0, 1.0, 1.0]), # C: anti-correlated
            (13, [1.0, 0.9, 0.0, 0.0]),   # D: full-dim #2 (cos ≈ .998)
        ],
        "vec_id long, embedding array<double>",
    )
    probes = spark.createDataFrame(
        [(0, [1.0, 1.0, 0.0, 0.0])], "probe_id long, probe_vec array<double>"
    )
    rows = {
        r["dim"]: r["mean_recall_r"]
        for r in truncation_recall_curve(
            corpus, probes, dims=[2, 4], k=2
        ).collect()
    }
    # 2-dim prefix: A and B tie at cos 1.0, id-break keeps both → {A, B};
    # truth is {A, D} → recall 1/2. Full dim reproduces truth exactly.
    assert rows == {2: 0.5, 4: 1.0}
