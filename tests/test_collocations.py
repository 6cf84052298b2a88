"""PMI collocations (textqc.collocations_pmi)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from spider_spark.operators import textqc


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(texts, min_count):
    uni, big = Counter(), Counter()
    nb = 0
    for t in texts:
        toks = re.findall(r"[a-z0-9]+", (t or "").lower())
        uni.update(toks)
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
            nb += 1
    nu = sum(uni.values())
    out = {}
    for (a, b), c12 in big.items():
        if c12 < min_count:
            continue
        pmi = math.log((c12 / nb) / ((uni[a] / nu) * (uni[b] / nu)))
        out[(a, b)] = (c12, uni[a], uni[b], round(pmi, 6))
    return out


def _run(spark, texts, min_count=2):
    return {
        (r["w1"], r["w2"]): (r["c12"], r["c1"], r["c2"], r["pmi_r"])
        for r in textqc.collocations_pmi(
            _docs(spark, texts), min_count=min_count
        ).collect()
    }


def test_collocation_beats_chance(spark):
    texts = ["new york is big", "new york is old", "big old new thing york"]
    got = _run(spark, texts, min_count=2)
    want = _brute(texts, 2)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3]
        assert abs(got[k][3] - want[k][3]) < 1e-9
    # "new york" (always adjacent) scores above chance 0
    assert got[("new", "york")][3] > 0


def test_no_bigrams_across_documents(spark):
    # "a" ends doc0, "b" starts doc1 -> never a bigram
    got = _run(spark, ["x a", "b y"], min_count=1)
    assert ("a", "b") not in got


def test_min_count_floor(spark):
    texts = ["p q p q", "r s"]
    assert ("r", "s") in _run(spark, texts, min_count=1)
    assert ("r", "s") not in _run(spark, texts, min_count=2)


def test_single_token_docs_contribute_unigrams_only(spark):
    got = _run(spark, ["solo", "solo", "pair pair"], min_count=1)
    # nu counts solo's occurrences, so pair-pair PMI reflects them
    want = _brute(["solo", "solo", "pair pair"], 1)
    assert got == pytest.approx(want) or got.keys() == want.keys()
    for k in want:
        assert abs(got[k][3] - want[k][3]) < 1e-9


def test_differential_vs_bruteforce(spark):
    vocab = "alpha beta gamma delta eps zeta".split()
    texts, x = [], 5
    for _ in range(25):
        words = []
        for _ in range(18):
            x = (x * 1103515245 + 12345) % (2**31)
            words.append(vocab[x % len(vocab)])
        texts.append(" ".join(words))
    want = _brute(texts, 3)
    got = _run(spark, texts, min_count=3)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3], k
        assert abs(got[k][3] - want[k][3]) < 1e-9, k


def test_rejects_bad_min_count(spark):
    with pytest.raises(ValueError):
        textqc.collocations_pmi(_docs(spark, ["x"]), min_count=0)
