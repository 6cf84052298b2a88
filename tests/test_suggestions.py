"""Spell suggestions via k-gram index + edit distance (index.term_suggestions)."""

from __future__ import annotations

import re

import pytest

from spider_spark.operators import index as ix


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(texts, q, max_dist, n, min_overlap=1, k=2):
    vocab = {}
    for i, t in enumerate(texts):
        for tok in set(re.findall(r"[a-z0-9]+", (t or "").lower())):
            vocab[tok] = vocab.get(tok, 0) + 1
    def grams(t):
        return {t[i : i + k] for i in range(max(len(t) - (k - 1), 1))}
    qg = grams(q)
    cand = [
        (term, df, _lev(q, term))
        for term, df in vocab.items()
        if len(qg & grams(term)) >= min_overlap
    ]
    cand = [c for c in cand if c[2] <= max_dist]
    cand.sort(key=lambda c: (c[2], -c[1], c[0]))
    return [(t, df, d, r + 1) for r, (t, df, d) in enumerate(cand[:n])]


def _run(spark, texts, q, **kw):
    return [
        (r["term"], r["df"], r["dist"], r["rank"])
        for r in ix.term_suggestions(_docs(spark, texts), q, **kw).orderBy("rank").collect()
    ]


def test_exact_vocab_hit_ranks_first(spark):
    texts = ["spark sparks sharp", "spark spork"]
    got = _run(spark, texts, "spark", n=3)
    assert got[0] == ("spark", 2, 0, 1)


def test_ranked_by_dist_then_df_then_term(spark):
    # "cat" absent; "cart"/"coat" both dist 1 — df breaks the tie; "cast"
    # (dist 1, df 1) ranks after higher-df "cart" and before "coat" only
    # by term order among equals
    texts = ["cart coat", "cart", "cast"]
    got = _run(spark, texts, "cat", n=10)
    assert got == [("cart", 2, 1, 1), ("cast", 1, 1, 2), ("coat", 1, 1, 3)]


def test_max_dist_filters(spark):
    got = _run(spark, ["cart chart charts"], "cat", max_dist=1, n=10)
    assert [g[0] for g in got] == ["cart"]


def test_candidate_recall_needs_shared_gram(spark):
    # "xy" is within 2 edits of "ab" but shares no bigram — the k-gram
    # candidate stage (documented heuristic) never surfaces it
    got = _run(spark, ["xy ab"], "ab", n=10)
    assert [g[0] for g in got] == ["ab"]


def test_differential_vs_bruteforce(spark):
    vocab = (
        "table tables tabled cable fable stable tablet tumble treble "
        "part parts party parse sparse spar spark"
    ).split()
    texts, x = [], 7
    for _ in range(30):
        words = []
        for _ in range(20):
            x = (x * 1103515245 + 12345) % (2**31)
            words.append(vocab[x % len(vocab)])
        texts.append(" ".join(words))
    for q, md in (("tabl", 2), ("part", 1), ("sprk", 2)):
        want = _brute(texts, q, md, 5)
        got = _run(spark, texts, q, max_dist=md, n=5)
        assert got == want, q


def test_rejects_bad_inputs(spark):
    df = _docs(spark, ["x"])
    with pytest.raises(ValueError):
        ix.term_suggestions(df, "two words")
    with pytest.raises(ValueError):
        ix.term_suggestions(df, "")
    with pytest.raises(ValueError):
        ix.term_suggestions(df, "ok", n=0)


def test_symspell_matches_brute_force(spark):
    import itertools

    docs = spark.createDataFrame(
        [
            (0, "spark spark spark sparse parse park"),
            (1, "spark stream streams merge"),
            (2, "park parks sparks"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [("spark",), ("sprk",), ("parky",), ("zzz",), ("STREAM ",)],
        "query_term string",
    )
    got = {}
    for r in ix.symspell_suggestions(docs, queries, n=3).collect():
        got.setdefault(r["query_term"], []).append(
            (r["rank"], r["term"], r["df"], r["dist"])
        )
    for v in got.values():
        v.sort()

    # brute force: full vocab scan with real edit distance
    import re as _re

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    texts = [
        "spark spark spark sparse parse park",
        "spark stream streams merge",
        "park parks sparks",
    ]
    vocab = {}
    for t in texts:
        for w in set(_re.findall(r"[a-z0-9]+", t)):
            vocab[w] = vocab.get(w, 0) + 1
    want = {}
    for q in ["spark", "sprk", "parky", "zzz", "stream"]:
        cands = [
            (w, df, lev(q, w)) for w, df in vocab.items() if lev(q, w) <= 1
        ]
        ranked = sorted(cands, key=lambda c: (c[2], -c[1], c[0]))[:3]
        if ranked:
            want[q] = sorted(
                (i + 1, w, df, d) for i, (w, df, d) in enumerate(ranked)
            )
    assert got == want
    assert "zzz" not in got
    # exact vocab hit ranks first for 'spark'
    assert got["spark"][0][1] == "spark" and got["spark"][0][3] == 0


def test_symspell_transposition_excluded(spark):
    # 'abc' vs 'acb' share the delete 'ab'?? no — deletes of abc:
    # {bc, ac, ab}; of acb: {cb, ab, ac} — share 'ac'/'ab', but true
    # distance is 2: the verify step must drop it.
    docs = spark.createDataFrame([(0, "acb")], "doc_id long, text string")
    queries = spark.createDataFrame([("abc",)], "query_term string")
    assert ix.symspell_suggestions(docs, queries).count() == 0
