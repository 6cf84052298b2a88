"""ngram_containment (dedup.py): the asymmetric near-dup signal Jaccard
misses — a small doc swallowed whole by a big one."""

from __future__ import annotations

import pytest

from spider_spark.operators import dedup


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id long, text_a string, text_b string")


def test_containment_swallowed_doc(spark):
    small = "alpha beta gamma delta epsilon"
    big = "intro words here " + small + " plus a very long tail " + "filler " * 30
    out = dedup.ngram_containment(_pairs(spark, [(1, small, big)])).collect()[0]
    # every 3-gram of the small doc appears in the big one
    assert out.cont_ab == pytest.approx(1.0)
    assert out.cont_ba < 0.5
    # while symmetric jaccard is small — the signal containment adds
    j = dedup.ngram_jaccard(_pairs(spark, [(1, small, big)])).collect()[0].jaccard
    assert j < 0.5


def test_containment_hand_computed(spark):
    # a: grams {x y z, y z w}; b: grams {x y z, y z q} -> inter 1
    out = dedup.ngram_containment(
        _pairs(spark, [(1, "x y z w", "x y z q")])
    ).collect()[0]
    assert out.cont_ab == pytest.approx(0.5)
    assert out.cont_ba == pytest.approx(0.5)


def test_containment_disjoint_and_identical(spark):
    rows = [(1, "a b c d", "a b c d"), (2, "a b c", "x y z")]
    got = {
        r.id: (r.cont_ab, r.cont_ba)
        for r in dedup.ngram_containment(_pairs(spark, rows)).collect()
    }
    assert got[1] == (1.0, 1.0)
    assert got[2] == (0.0, 0.0)


def test_containment_short_texts_no_crash(spark):
    # below n tokens the gram degrades to the whole text (ngram_jaccard
    # edge semantics, shared)
    out = dedup.ngram_containment(_pairs(spark, [(1, "ab", "ab")])).collect()[0]
    assert out.cont_ab == pytest.approx(1.0)
