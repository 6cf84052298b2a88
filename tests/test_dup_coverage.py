"""dup_ngram_coverage: per-doc duplicate-span statistics (fixed-length
n-gram restatement of Lee et al. 2022 suffix-array span dedup).

Hand-computed fixtures pin: cross-doc flagging, overlapping-span union
(no double counting), within-doc repeats NOT flagged at min_docs=2,
short/empty docs."""

from __future__ import annotations

from spider_spark.operators.dedup import dup_ngram_coverage


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dup_ngram_coverage(df, **kw)
    return {r["id"]: r.asDict() for r in out.collect()}


def test_shared_gram_coverage(spark):
    rows = [
        (0, "a b c d e f g h"),        # shares "a b c d e" with doc 1
        (1, "a b c d e x y z"),
        (2, "q w e r t y u i"),        # unique
    ]
    got = _run(spark, rows, n=5)
    assert got[0] == {"id": 0, "n_tokens": 8, "n_grams": 4,
                      "dup_gram_starts": 1, "covered_tokens": 5, "dup_coverage": 0.625}
    assert got[1]["dup_gram_starts"] == 1 and got[1]["covered_tokens"] == 5
    assert got[2]["dup_gram_starts"] == 0 and got[2]["dup_coverage"] == 0.0


def test_overlapping_spans_union_not_sum(spark):
    rows = [
        (0, "m n o p q r"),     # grams "m n o p q", "n o p q r" — both shared
        (1, "m n o p q r zz"),
    ]
    got = _run(spark, rows, n=5)
    # two flagged starts covering positions 0..5 → union is 6, not 10
    assert got[0]["dup_gram_starts"] == 2
    assert got[0]["covered_tokens"] == 6
    assert got[0]["dup_coverage"] == 1.0
    assert got[1]["covered_tokens"] == 6 and got[1]["n_tokens"] == 7


def test_within_doc_repeat_not_flagged_at_min_docs_2(spark):
    rows = [
        (0, "u v w x y zz u v w x y"),  # "u v w x y" twice, but only in doc 0
        (1, "totally different words here indeed"),
    ]
    got = _run(spark, rows, n=5)
    assert got[0]["dup_gram_starts"] == 0 and got[0]["covered_tokens"] == 0


def test_min_docs_1_flags_within_doc_repeats(spark):
    rows = [(0, "u v w x y zz u v w x y"), (1, "unrelated five word doc here")]
    got = _run(spark, rows, n=5, min_docs=1)
    # every gram trivially appears in ≥1 doc → full coverage
    assert got[0]["covered_tokens"] == got[0]["n_tokens"]


def test_short_and_empty_docs(spark):
    rows = [(0, "one two three"), (1, ""), (2, "   "), (3, "a b c d e"), (4, "a b c d e")]
    got = _run(spark, rows, n=5)
    assert got[0] == {"id": 0, "n_tokens": 3, "n_grams": 0,
                      "dup_gram_starts": 0, "covered_tokens": 0, "dup_coverage": 0.0}
    assert got[1]["n_tokens"] == 0 and got[1]["dup_coverage"] == 0.0
    assert got[2]["n_tokens"] == 0
    # exactly-n-token identical docs: one gram each, flagged, full coverage
    assert got[3]["dup_coverage"] == 1.0 and got[4]["covered_tokens"] == 5


def test_case_and_whitespace_normalized(spark):
    rows = [(0, "  Alpha Beta  Gamma Delta Eps "), (1, "alpha beta gamma delta eps tail")]
    got = _run(spark, rows, n=5)
    assert got[0]["dup_gram_starts"] == 1 and got[0]["covered_tokens"] == 5


# --- LSH banding parameter tuner (pure arithmetic, no Spark) ----------------


def test_lsh_capture_probability_matches_brute_force():
    import random

    from spider_spark.operators.dedup import lsh_capture_probability

    rng = random.Random(7)
    b, r, s = 8, 4, 0.8
    trials = 20000
    hits = 0
    for _ in range(trials):
        # each band matches iff all r rows match; each row matches w.p. s
        if any(all(rng.random() < s for _ in range(r)) for _ in range(b)):
            hits += 1
    est = hits / trials
    assert abs(est - lsh_capture_probability(s, b, r)) < 0.02


def test_choose_lsh_params_threshold_and_floor():
    from spider_spark.operators.dedup import (
        choose_lsh_params,
        lsh_capture_probability,
        lsh_threshold,
    )

    b, r = choose_lsh_params(0.8, num_perm=64)
    assert b * r == 64
    # the chosen curve must actually capture 0.9-similar pairs ≥95%
    assert lsh_capture_probability(0.9, b, r) >= 0.95
    # and its threshold is the closest divisor pair to the target among
    # those meeting the floor (sanity: within a sane window of the target)
    assert 0.45 <= lsh_threshold(b, r) <= 0.95

    # without a floor, pure threshold matching
    b2, r2 = choose_lsh_params(0.5, num_perm=16, min_capture_at=None)
    assert b2 * r2 == 16
    alt = [(bb, 16 // bb) for bb in (1, 2, 4, 8, 16)]
    best = min(alt, key=lambda br: abs(lsh_threshold(*br) - 0.5))
    assert (b2, r2) == best
