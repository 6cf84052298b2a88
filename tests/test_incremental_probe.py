"""Incremental MinHash-LSH probe (dedup.minhash_probe_pairs): the
per-tick near-dup path must equal the batch operator restricted to pairs
touching a new capture — the differential that makes "never re-dedup the
standing corpus" safe to deploy."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import dedup


@pytest.fixture(scope="module")
def split_corpus(spark):
    """Planted near/exact dups arranged so every dup class is exercised:
    standing×standing (must NOT be re-reported), new×standing, new×new."""
    rows = []
    for i in range(30):
        toks = [f"w{i}x{j}" for j in range(30)]
        rows.append((i, " ".join(toks), "standing"))
        if i % 3 == 0:  # standing near-copy → standing×standing pair
            near = list(toks)
            near[7] = "CHANGED"
            rows.append((100 + i, " ".join(near), "standing"))
        if i % 4 == 0:  # new near-copy of a standing doc → new×standing
            near = list(toks)
            near[15] = "ALSOCHANGED"
            rows.append((200 + i, " ".join(near), "new"))
        if i % 5 == 0:  # two new exact copies → new×new AND new×standing
            rows.append((300 + i, " ".join(toks), "new"))
            rows.append((400 + i, " ".join(toks), "new"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "phase"])
    )


def _pairs_set(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_probe_equals_batch_on_new_touching_pairs(spark, split_corpus):
    standing = split_corpus.filter(F.col("phase") == "standing")
    new = split_corpus.filter(F.col("phase") == "new")
    kw = dict(num_perm=64, bands=16, jaccard_threshold=0.5)

    batch = dedup.minhash_near_duplicates(
        split_corpus, jaccard_threshold=0.5, bands=16, num_perm=64
    )
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    want = {
        p
        for p in _pairs_set(batch)
        if p[0] in new_ids or p[1] in new_ids
    }

    got = _pairs_set(
        dedup.minhash_probe_pairs(
            dedup.minhash_signatures(standing),
            dedup.minhash_signatures(new),
            **kw,
        )
    )
    assert want, "plant produced no new-touching pairs"
    assert got == want
    # and no standing-internal pair leaks through
    assert all(a in new_ids or b in new_ids for a, b in got)


def test_probe_finds_planted_classes(spark, split_corpus):
    standing = split_corpus.filter(F.col("phase") == "standing")
    new = split_corpus.filter(F.col("phase") == "new")
    got = _pairs_set(
        dedup.minhash_probe_pairs(
            dedup.minhash_signatures(standing),
            dedup.minhash_signatures(new),
            jaccard_threshold=0.5,
        )
    )
    # new×standing near-copy and the new×new exact pair for i=0 both land
    assert (0, 200) in got
    assert (300, 400) in got


def test_probe_empty_new_side(spark, split_corpus):
    standing = split_corpus.filter(F.col("phase") == "standing")
    empty = dedup.minhash_signatures(
        spark.createDataFrame([], "doc_id long, text string")
    )
    out = dedup.minhash_probe_pairs(
        dedup.minhash_signatures(standing), empty, jaccard_threshold=0.5
    )
    assert out.count() == 0


def test_probe_combined_hot_bucket_census(spark):
    """A bucket hot only when both sides are counted together must drop in
    the probe exactly as it does in batch — 60 identical docs split 30/30
    with max_bucket_size=40: each side alone is under the cap, combined it
    is over, so the probe must report ZERO pairs (batch drops the bucket)."""
    rows = [(i, "same text everywhere repeated tokens", "s" if i < 30 else "n") for i in range(60)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "phase"]))
    out = dedup.minhash_probe_pairs(
        dedup.minhash_signatures(df.filter(F.col("phase") == "s")),
        dedup.minhash_signatures(df.filter(F.col("phase") == "n")),
        jaccard_threshold=0.5,
        max_bucket_size=40,
    )
    assert out.count() == 0
