"""remove_duplicate_spans (Lee et al. keep-first span rewrite) and
bff_paragraph_dedup (Dolma-BFF-style bloom-accelerated paragraph dedup)."""

from __future__ import annotations

import pytest

from spider_spark.operators import dedup


@pytest.fixture()
def span_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "something else entirely here the quick brown fox jumps over the wall"),
            (3, "the quick brown fox jumps again and again and again and again"),
            (4, ""),
            (5, "unique words only in this one document nothing shared"),
        ],
        ["doc_id", "text"],
    )


def test_owner_keeps_span_others_lose_it(spark, span_docs):
    rows = {r.id: r for r in dedup.remove_duplicate_spans(span_docs, n=5).collect()}
    # doc 1 owns every shared gram (smallest id) → nothing removed
    assert rows[1].removed_tokens == 0
    assert rows[1].clean_text == "the quick brown fox jumps over the lazy dog today"
    # doc 2 shares "the quick brown fox jumps over the" (3 gram starts → 7
    # covered positions)
    assert rows[2].removed_tokens == 7
    assert rows[2].clean_text == "something else entirely here wall"
    # doc 3 shares only the 5-token prefix
    assert rows[3].removed_tokens == 5
    assert rows[3].clean_text.startswith("again")
    # docs with no shared grams, and empty docs, survive untouched
    assert rows[5].removed_tokens == 0
    assert rows[4].n_tokens == 0 and rows[4].clean_text == ""


def test_fully_covered_doc_still_emits_row(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee"), (2, "aa bb cc dd ee")], ["doc_id", "text"]
    )
    rows = {r.id: r for r in dedup.remove_duplicate_spans(docs, n=5).collect()}
    assert rows[1].removed_tokens == 0  # owner
    assert rows[2].removed_tokens == 5 and rows[2].clean_text == ""


def test_min_docs_threshold(spark, span_docs):
    # with min_docs=4 no gram qualifies (max is 3 docs sharing the prefix)
    rows = dedup.remove_duplicate_spans(span_docs, n=5, min_docs=4).collect()
    assert all(r.removed_tokens == 0 for r in rows)


def test_exactly_one_copy_survives_corpus_wide(spark):
    text = "w1 w2 w3 w4 w5 w6 w7"
    docs = spark.createDataFrame([(i, text) for i in range(1, 6)], ["doc_id", "text"])
    rows = {r.id: r for r in dedup.remove_duplicate_spans(docs, n=5).collect()}
    survivors = [i for i, r in rows.items() if r.clean_text == text]
    assert survivors == [1]
    assert all(rows[i].clean_text == "" for i in range(2, 6))


@pytest.fixture()
def para_docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta\ncommon paragraph here\ngamma"),
            (2, "common paragraph here\ndelta"),
            (3, "epsilon\ncommon  PARAGRAPH   here\nzeta\ncommon paragraph here"),
            (4, "\n\n"),
            (5, "delta"),
        ],
        ["doc_id", "text"],
    )


def test_bff_keep_first_semantics(spark, para_docs):
    rows = {r.id: r for r in dedup.bff_paragraph_dedup(para_docs).collect()}
    assert rows[1].n_removed == 0  # owns "common paragraph here"
    assert rows[2].clean_text == "delta"  # owns "delta", loses the common one
    # doc 3: both copies removed (normalization folds case + whitespace)
    assert rows[3].n_removed == 2 and rows[3].clean_text == "epsilon\nzeta"
    # doc 5's "delta" already seen at (2, 1) → removed
    assert rows[5].n_removed == 1 and rows[5].clean_text == ""
    # blank-only doc has no paragraph rows at all (same contract as line_dedup)
    assert 4 not in rows


def test_bff_bloom_on_off_identical(spark, para_docs):
    # bloom_min_dups=0 forces the bloom machinery even on a tiny census;
    # the default gate (census too small → exact join) must also match
    a = sorted(
        map(tuple, dedup.bff_paragraph_dedup(para_docs, use_bloom=True, bloom_min_dups=0).collect())
    )
    b = sorted(map(tuple, dedup.bff_paragraph_dedup(para_docs, use_bloom=False).collect()))
    g = sorted(map(tuple, dedup.bff_paragraph_dedup(para_docs, use_bloom=True).collect()))
    assert a == b == g


def test_bff_bloom_false_positives_cost_work_not_correctness(spark):
    # 64-bit shards over 60 distinct paragraphs → FP rate near 1, every
    # unique paragraph becomes a maybe-dup — result must STILL be exact
    docs = spark.createDataFrame(
        [(i, f"unique paragraph number {i}\nshared line") for i in range(30)],
        ["doc_id", "text"],
    )
    tiny = dedup.bff_paragraph_dedup(
        docs, use_bloom=True, num_shards=2, bits_per_shard=64, num_hashes=2, bloom_min_dups=0
    )
    exact = dedup.bff_paragraph_dedup(docs, use_bloom=False)
    assert sorted(map(tuple, tiny.collect())) == sorted(map(tuple, exact.collect()))
    # and the semantics: only doc 0 keeps "shared line"
    rows = {r.id: r for r in exact.collect()}
    assert rows[0].n_removed == 0
    assert all(rows[i].n_removed == 1 for i in range(1, 30))
