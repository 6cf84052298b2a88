"""Tests for round-2 additions: IVF ANN, Gopher-style repetition signals,
corpus-level boilerplate n-gram census."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import similarity, textqc


def _clustered_vectors(n_clusters=4, per_cluster=15, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 5
    rows = []
    for c in range(n_clusters):
        for j in range(per_cluster):
            v = centers[c] + rng.standard_normal(dim) * 0.3
            rows.append((c * per_cluster + j, [float(x) for x in v]))
    return rows


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(
        _clustered_vectors(), "vec_id long, embedding array<float>"
    ).persist()


def test_ivf_matches_brute_force_on_clustered_data(emb_df):
    """With centroids per true cluster and n_probe covering the probe's
    cluster, IVF top-k must equal the exact brute-force answer."""
    probes = emb_df.filter(F.col("vec_id").isin(0, 15, 30)).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    corpus = emb_df.filter(~F.col("vec_id").isin(0, 15, 30))
    # one representative per cluster as the centroid table
    cents = emb_df.filter(F.col("vec_id").isin(1, 16, 31, 46)).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    exact = {
        (r.probe_id, r.rank): r.vec_id
        for r in similarity.brute_force_topk(corpus, probes, k=5).collect()
    }
    approx = {
        (r.probe_id, r.rank): r.vec_id
        for r in similarity.ivf_topk(corpus, probes, k=5, n_probe=1, centroids=cents).collect()
    }
    assert approx == exact


def test_ivf_default_centroids_recall(emb_df):
    """Default (smallest-id) centroids with n_probe=4 of 8 lists: recall@5
    vs brute force should be high on clustered data."""
    probes = emb_df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    corpus = emb_df.filter(F.col("vec_id") >= 2)
    exact = similarity.brute_force_topk(corpus, probes, k=5).collect()
    approx = similarity.ivf_topk(corpus, probes, k=5, n_centroids=8, n_probe=4).collect()
    exact_set = {(r.probe_id, r.vec_id) for r in exact}
    approx_set = {(r.probe_id, r.vec_id) for r in approx}
    assert len(exact_set & approx_set) / len(exact_set) >= 0.8


def test_ivf_custom_centroid_column_names(emb_df):
    from pyspark.sql import functions as F2

    probes = emb_df.filter(F2.col("vec_id") < 2).select(
        F2.col("vec_id").alias("probe_id"), F2.col("embedding").alias("probe_vec")
    )
    corpus = emb_df.filter(F2.col("vec_id") >= 2)
    cents = emb_df.filter(F2.col("vec_id").isin(1, 16, 31, 46)).select(
        F2.col("vec_id").alias("centroid_id"), F2.col("embedding").alias("vec")
    )
    out = similarity.ivf_topk(
        corpus, probes, k=3, n_probe=2,
        centroids=cents, cent_id_col="centroid_id", cent_vec_col="vec",
    )
    assert out.count() == 6  # 2 probes × top-3


def test_ivf_empty_centroids_raises(spark, emb_df):
    empty = emb_df.filter("vec_id < 0").select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    probes = emb_df.limit(1).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    with pytest.raises(ValueError):
        similarity.ivf_topk(emb_df, probes, centroids=empty)


def test_repetition_signals_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (0, "a a b"),          # words 3/2 distinct; bigrams [a a, a b]
            (1, "x y x y x"),      # words 5/2; bigrams [x y, y x, x y, y x]
            (2, "solo"),           # 1 word, no bigrams
            (3, "all different words here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textqc.repetition_signals(docs).collect()}
    assert out[0].n_words == 3
    assert out[0].dup_word_frac == pytest.approx(1 / 3, abs=1e-4)
    assert out[0].dup_ngram_frac == 0.0
    assert out[0].top_ngram_frac == 0.5
    assert out[1].dup_word_frac == 0.6
    assert out[1].dup_ngram_frac == 0.5  # 4 bigrams, 2 distinct
    assert out[1].top_ngram_frac == 0.5
    assert out[2].n_words == 1 and out[2].top_ngram_frac == 0.0
    assert out[3].dup_word_frac == 0.0 and out[3].dup_ngram_frac == 0.0


def test_repetition_case_insensitive_tokens(spark):
    docs = spark.createDataFrame([(0, "The THE the")], "doc_id long, text string")
    row = textqc.repetition_signals(docs).collect()[0]
    assert row.dup_word_frac == pytest.approx(2 / 3, abs=1e-4)
    assert row.top_ngram_frac == 1.0  # both bigrams are 'the the'


def test_boilerplate_ngrams_census(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox"),
            (1, "the quick brown cat"),
            (2, "totally different words here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textqc.boilerplate_ngrams(docs, ngram_n=3, min_docs=2).collect()}
    # 'the quick brown' appears in docs 0 and 1 → boilerplate
    assert out[0].n_grams == 2 and out[0].boilerplate_frac == 0.5
    assert out[1].boilerplate_frac == 0.5
    assert out[2].boilerplate_frac == 0.0


def test_clean_corpus_first_match_wins_reason_chain(spark):
    keep_text = (
        "the and of to in is for on with that alpha beta gamma delta epsilon "
        "zeta eta theta iota kappa lambda mu nu xi omicron"
    )  # 25 distinct en words: passes every gate
    docs = spark.createDataFrame(
        [
            (0, "short doc"),  # 2 words → too_short
            (1, "the and of to in is for on with that " * 3),  # 30 words, dup 0.667 → repetition
            (2, "der die und das ist nicht mit ein für auf " + keep_text[40:]),  # de → lang
            (3, keep_text),  # keep
            (4, keep_text),  # exact dup of 3 → duplicate
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.keep, r.drop_reason) for r in textqc.clean_corpus(docs).collect()}
    assert out[0] == (False, "too_short")
    assert out[1] == (False, "repetition")
    assert out[2] == (False, "lang")
    assert out[3] == (True, None)
    assert out[4] == (False, "duplicate")


def test_boilerplate_counts_occurrences_not_types(spark):
    # doc 0 repeats the shared gram twice → 2 of its 4 grams are boilerplate
    docs = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "a b c unrelated")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textqc.boilerplate_ngrams(docs, ngram_n=3, min_docs=2).collect()}
    assert out[0].n_grams == 4
    assert out[0].boilerplate_frac == 0.5  # positions 1 and 4 are 'a b c'
    assert out[1].boilerplate_frac == 0.5  # 1 of its 2 grams


def test_line_dedup_c4_rule(spark):
    """Any normalized line occurring >= min_count times across the corpus
    is removed from EVERY document; survivors keep original text + order."""
    docs = spark.createDataFrame(
        [
            (1, "copyright 2026\nalpha beta\nsubscribe now"),
            (2, "Copyright   2026\ngamma delta\nsubscribe now"),
            (3, "COPYRIGHT 2026\nalpha beta\n\n  \nunique line"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in textqc.line_dedup(docs, min_count=3).collect()
    }
    # "copyright 2026" normalizes identically in all 3 docs -> removed
    assert out[1].clean_text == "alpha beta\nsubscribe now"
    assert out[2].clean_text == "gamma delta\nsubscribe now"
    # blank/whitespace-only lines dropped outright, not counted
    assert out[3].n_lines == 3 and out[3].clean_text == "alpha beta\nunique line"
    assert [out[i].n_dup_lines for i in (1, 2, 3)] == [1, 1, 1]
    # "subscribe now" appears only twice -> below min_count, survives


def test_line_dedup_all_dup_doc_empty(spark):
    docs = spark.createDataFrame(
        [(i, "same line") for i in range(4)], "doc_id long, text string"
    )
    rows = textqc.line_dedup(docs, min_count=3).collect()
    assert all(r.clean_text == "" and r.n_dup_lines == 1 for r in rows)


def test_exact_near_duplicates_ground_truth(spark, emb_df):
    """exact_near_duplicates finds a planted perturbed copy, and the LSH
    path's output is a subset of the exact pair set (recall measured
    against this ground truth)."""
    planted = emb_df.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.expr(
            "transform(embedding, (v, i) -> CAST(v AS FLOAT)"
            " + CASE WHEN i = 0 THEN CAST(0.01 AS FLOAT) ELSE CAST(0.0 AS FLOAT) END)"
        ).alias("embedding"),
    )
    corpus = emb_df.unionByName(planted)
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.exact_near_duplicates(
            corpus, cosine_threshold=0.999
        ).collect()
    }
    assert (0, 1000) in exact
    lsh = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_duplicates(
            corpus, dim=16, cosine_threshold=0.999
        ).collect()
    }
    assert lsh <= exact and (0, 1000) in lsh


def _gopher_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return textqc.gopher_quality_flags(df).collect()[0]


def test_gopher_rules_hand_computed(spark):
    words = ("the be to of and that have with " + "alpha beta gamma delta " * 12).strip()
    r = _gopher_one(spark, words)  # 8 + 48 = 56 words, all alphabetic
    assert r.n_words == 56 and r.word_count_ok
    assert r.n_stopword_kinds == 8 and r.stopwords_ok
    assert r.frac_alpha_words == 1.0 and r.alpha_words_ok
    assert r.gopher_keep


def test_gopher_bullet_and_ellipsis_line_rules(spark):
    base = "the of " + "word " * 60
    bullets = "\n".join(["- item"] * 19 + ["plain line"])  # 95% bullets
    r = _gopher_one(spark, base + "\n" + bullets)
    assert r.frac_bullet_lines > 0.9 and not r.bullet_lines_ok and not r.gopher_keep
    ell = "\n".join(["line one...", "line two…", "ok line", "ok line2"])  # 50% (the base line makes 40%)
    r2 = _gopher_one(spark, base + "\n" + ell)
    assert r2.frac_ellipsis_lines == 0.4 and not r2.ellipsis_lines_ok


def test_gopher_symbol_ratio_and_word_rules(spark):
    r = _gopher_one(spark, "the of " + "### ... ## " * 30 + "w " * 60)
    assert not r.symbol_ratio_ok and not r.gopher_keep
    # numeric-only "words" fail the alphabetic rule
    r2 = _gopher_one(spark, "the of " + "123 456 " * 40)
    assert r2.frac_alpha_words < 0.8 and not r2.alpha_words_ok
    # too short
    r3 = _gopher_one(spark, "the of tiny doc")
    assert not r3.word_count_ok and not r3.gopher_keep


def test_gopher_empty_text(spark):
    r = _gopher_one(spark, "   ")
    assert r.n_words == 0 and not r.gopher_keep
    assert r.mean_word_len == 0.0 and r.symbol_ratio == 0.0


def test_c4_line_filters_rules(spark):
    docs = spark.createDataFrame(
        [
            (1, "a fine sentence with enough words here.\nshort one.\nno terminal punct with many words\nenable javascript to proceed with this page.\nsecond proper sentence carries the page forward!\nthird proper sentence seals the page for keeps?"),
            (2, "uses a { brace and otherwise fine sentence here.\nmore good words in this sentence too.\nthird fine sentence to pass the line bar."),
            (3, "Lorem Ipsum dolor sit amet consectetur adipiscing elit."),
            (4, "only one proper sentence lives in this page."),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textqc.c4_line_filters(docs).collect()}
    r1 = out[1]
    assert r1.keep and r1.drop_reason is None
    assert r1.n_lines == 6 and r1.n_kept_lines == 3
    assert r1.clean_text.split("\n") == [
        "a fine sentence with enough words here.",
        "second proper sentence carries the page forward!",
        "third proper sentence seals the page for keeps?",
    ]
    assert out[2].drop_reason == "curly_brace" and not out[2].keep
    assert out[3].drop_reason == "lorem_ipsum"  # case-insensitive
    assert out[4].drop_reason == "too_few_lines" and out[4].n_kept_lines == 1
    assert all(out[i].clean_text is None for i in (2, 3, 4))


def test_c4_badwords_and_quote_terminal(spark):
    docs = spark.createDataFrame(
        [
            (1, 'he said "this quoted sentence still ends properly."\nanother full sentence rounds out this document.\na third sentence completes the minimum line count.'),
            (2, "a perfectly fine sentence mentions the forbidden gizmo here.\nsecond sentence is fine and long enough too.\nthird sentence is fine and long enough also."),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in textqc.c4_line_filters(docs, badwords=["GIZMO"]).collect()
    }
    assert out[1].keep and out[1].n_kept_lines == 3
    assert out[2].drop_reason == "badword"


def test_compression_ratio_signal(spark):
    import zlib

    from spider_spark.operators.textqc import compression_ratio

    import random as _random

    rng = _random.Random(7)
    noise = "".join(chr(33 + rng.randrange(90)) for _ in range(2000))
    prose = (
        "the crawler fetched another page and extracted its links before "
        "scheduling the next host politely "
    ) * 20
    spammy = "buy cheap widgets " * 120
    rows = [(0, prose), (1, spammy), (2, noise), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_bytes"], r["n_compressed"], r["ratio_r"])
        for r in compression_ratio(df).collect()
    }
    for i, t in rows[:3]:
        b = (t or "").encode()
        want = len(zlib.compress(b, 6))
        assert got[i] == (len(b), want, round(want / len(b), 6))
    assert got[3] == (0, 0, None) and got[4] == (0, 0, None)
    # the band property: repetition << prose << noise
    assert got[1][2] < got[0][2] < got[2][2]
    assert got[2][2] > 0.8


def test_char_entropy(spark):
    import collections
    import math

    from spider_spark.operators.textqc import char_entropy

    rows = [
        (0, "aaaaaaaa"),                       # zero entropy
        (1, "abababab"),                       # exactly 1 bit
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, ""),
        (4, None),
        (5, "x" * 3000),                       # cap applies
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_chars"], r["entropy_r"])
        for r in char_entropy(df, max_chars=1000).collect()
    }

    def ent(t):
        c = collections.Counter(t)
        n = len(t)
        return -sum((k / n) * math.log2(k / n) for k in c.values())

    assert got[0] == (8, 0.0)
    assert got[1] == (8, 1.0)
    assert got[2] == (43, round(ent(rows[2][1]), 6))
    assert got[3] == (0, None) and got[4] == (0, None)
    assert got[5] == (1000, 0.0)
    # band property: prose well above repetition
    assert got[2][1] > 3.0


def test_code_fraction_cues_and_gating(spark):
    from spider_spark.operators.textqc import code_fraction

    code = "def f(x):\n    return x == 1\nclass A {\n  int y;\n}"
    prose = "This is a plain paragraph.\nIt has two prose lines."
    short_brace = "one line only {"   # 1 cue line but n_code < 3 → not codey
    mixed = "Intro prose here\nvar x = 1;\nif (x) {\n}\nclosing words"
    rows = [(0, code), (1, prose), (2, short_brace), (3, mixed),
            (4, ""), (5, None), (6, "   \n  \n")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_lines"], r["n_code_lines"], r["is_codey"])
        for r in code_fraction(df).collect()
    }
    assert got[0] == (5, 5, True)
    assert got[1] == (2, 0, False)
    assert got[2] == (1, 1, False)
    n_lines, n_code, codey = got[3]
    assert n_lines == 5 and n_code == 3 and codey  # 3/5 = 0.6 ≥ 0.3
    for i in (4, 5, 6):
        assert got[i] == (0, 0, False)
