"""Flesch Reading Ease (textqc.readability_scores)."""

from __future__ import annotations

import re

from spider_spark.operators import textqc


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _syl(w):
    return max(1, len(re.findall(r"[aeiouy]+", w)))


def _brute(t):
    c = (t or "").lower()
    words = re.findall(r"[a-z]+", c)
    if not words:
        return (0, 0, 0, None)
    sent = max(1, len(re.findall(r"[.!?]+", c)))
    syl = sum(_syl(w) for w in words)
    fre = round(
        206.835 - 1.015 * (len(words) / sent) - 84.6 * (syl / len(words)), 6
    )
    return (len(words), sent, syl, fre)


def _run(spark, texts):
    return {
        r["doc_id"]: (
            r["n_words"],
            r["n_sentences"],
            r["n_syllables"],
            r["flesch_r"],
        )
        for r in textqc.readability_scores(_docs(spark, texts)).collect()
    }


def test_known_counts(spark):
    got = _run(spark, ["The cat sat. It purred!"])
    # words: the cat sat it purred -> 5; sentences 2; syllables 1+1+1+1+2=6
    n_w, n_s, n_syl, fre = got[0]
    assert (n_w, n_s, n_syl) == (5, 2, 6)
    assert abs(fre - _brute("The cat sat. It purred!")[3]) < 1e-9


def test_no_terminator_counts_one_sentence(spark):
    got = _run(spark, ["hello world"])
    assert got[0][1] == 1


def test_empty_and_null_texts(spark):
    got = _run(spark, ["", None, "!!! 123"])
    for i in range(3):
        assert got[i] == (0, 0, 0, None)


def test_vowelless_word_counts_one_syllable(spark):
    got = _run(spark, ["tsk tsk."])
    assert got[0][2] == 2


def test_differential_vs_bruteforce(spark):
    vocab = "reading ease is a simple heuristic but it must agree exactly".split()
    texts, x = [], 3
    for _ in range(30):
        words = []
        for _ in range(25):
            x = (x * 1103515245 + 12345) % (2**31)
            words.append(vocab[x % len(vocab)])
            if x % 7 == 0:
                words[-1] += "."
            elif x % 11 == 0:
                words[-1] += "!"
        texts.append(" ".join(words))
    want = {i: _brute(t) for i, t in enumerate(texts)}
    got = _run(spark, texts)
    for i in want:
        assert got[i][:3] == want[i][:3], i
        assert abs(got[i][3] - want[i][3]) < 1e-9, i
