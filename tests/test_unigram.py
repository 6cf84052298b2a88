"""Unigram-LM tokenizer (operators/unigram.py) vs a pure-Python reference."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from spider_spark.operators import unigram as ug


def _ref_census(texts):
    c = Counter()
    for t in texts:
        for w in (t or "").lower().strip().split():
            c[w] += 1
    return c


def _ref_seed(census, seed_size, max_piece_len):
    cnt = Counter()
    for w, k in census.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                cnt[w[i : i + l]] += k
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    pieces = dict(top)
    for p, k in cnt.items():
        if len(p) == 1:
            pieces[p] = k
    return pieces


def _ref_estep(census, probs, max_piece_len):
    acc = {}
    for word, k in census.items():
        n = len(word)
        fwd = [0.0] * (n + 1)
        fwd[0] = 1.0
        spans = []
        for e in range(1, n + 1):
            for s in range(max(0, e - max_piece_len), e):
                p = probs.get(word[s:e])
                if p:
                    spans.append((s, e, word[s:e], p))
                    fwd[e] += fwd[s] * p
        if fwd[n] <= 0:
            continue
        bwd = [0.0] * (n + 1)
        bwd[n] = 1.0
        for s in range(n - 1, -1, -1):
            for e in range(s + 1, min(n, s + max_piece_len) + 1):
                p = probs.get(word[s:e])
                if p:
                    bwd[s] += p * bwd[e]
        for s, e, piece, p in spans:
            exp = fwd[s] * p * bwd[e] / fwd[n]
            if exp > 0:
                acc[piece] = acc.get(piece, 0.0) + exp * k
    return acc


def _ref_train(texts, vocab_size, seed_size, max_piece_len, em_iters, keep_frac):
    census = _ref_census(texts)
    pieces = _ref_seed(census, seed_size, max_piece_len)
    total = float(sum(pieces.values()))
    probs = {p: c / total for p, c in pieces.items()}
    for it in range(em_iters):
        got = _ref_estep(census, probs, max_piece_len)
        z = sum(got.values())
        if z <= 0:
            break
        probs = {p: e / z for p, e in got.items()}
        keep_n = max(vocab_size, int(math.ceil(len(probs) * keep_frac)))
        if it == em_iters - 1:
            keep_n = vocab_size
        ranked = sorted(probs.items(), key=lambda kv: (-round(kv[1], 12), kv[0]))
        kept = dict(ranked[:keep_n])
        for p, v in probs.items():
            if len(p) == 1:
                kept[p] = v
        z2 = sum(kept.values())
        probs = {p: v / z2 for p, v in kept.items()}
    return probs


TEXTS = [
    "spark spark spark streaming streaming window",
    "spark window merge merge sort sort sort",
    "stream stream streaming spark merge window window",
    "sorted sorting merge spark spark streaming",
]
PARAMS = dict(vocab_size=30, seed_size=200, max_piece_len=8, em_iters=2,
              keep_frac=0.7)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_matches_reference(spark):
    got = dict(ug.train_unigram(_docs(spark, TEXTS), **PARAMS))
    want = _ref_train(TEXTS, **PARAMS)
    assert set(got) == set(want)
    for p, lp in got.items():
        assert abs(lp - math.log(want[p])) < 1e-6, p


def test_frequent_word_becomes_one_piece(spark):
    pieces = ug.train_unigram(_docs(spark, TEXTS), **PARAMS)
    logp = dict(pieces)
    assert "spark" in logp
    assert ug.viterbi_segment("spark", logp) == ["spark"]


def test_encode_matches_viterbi_reference(spark):
    pieces = ug.train_unigram(_docs(spark, TEXTS), **PARAMS)
    logp = dict(pieces)
    enc = {
        r["id"]: (r["n_words"], r["n_tokens"])
        for r in ug.encode_unigram(_docs(spark, TEXTS), pieces).collect()
    }
    for i, t in enumerate(TEXTS):
        words = t.lower().split()
        want = sum(len(ug.viterbi_segment(w, logp)) for w in words)
        assert enc[i] == (len(words), want)


def test_unseen_chars_fall_back_to_unk(spark):
    pieces = ug.train_unigram(_docs(spark, TEXTS), **PARAMS)
    enc = ug.encode_unigram(
        _docs(spark, ["zzqq spark"]), pieces
    ).collect()[0]
    # 'z'/'q' unseen -> 4 unk singles; 'spark' is one piece
    assert enc["n_words"] == 2 and enc["n_tokens"] == 5


def test_partitioning_invariance(spark):
    one = dict(
        ug.train_unigram(_docs(spark, TEXTS).repartition(1), **PARAMS)
    )
    many = dict(
        ug.train_unigram(_docs(spark, TEXTS).repartition(8), **PARAMS)
    )
    assert set(one) == set(many)
    for p in one:
        assert abs(one[p] - many[p]) < 1e-9


def test_validation(spark):
    with pytest.raises(ValueError):
        ug.train_unigram(_docs(spark, TEXTS), vocab_size=50, seed_size=10)
