"""Zipf rank-frequency fit (textqc.zipf_fit)."""

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


def _brute(texts, k):
    c = Counter()
    for t in texts:
        c.update(re.findall(r"[a-z0-9]+", (t or "").lower()))
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    if len(ranked) < 2:
        return (len(ranked), None, None, None)
    pts = [
        (math.log(r + 1), math.log(f)) for r, (_, f) in enumerate(ranked)
    ]
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts)
    syy = sum(p[1] ** 2 for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    dx, dy, cov = n * sxx - sx * sx, n * syy - sy * sy, n * sxy - sx * sy
    if dx <= 0:
        return (n, None, None, None)
    slope = cov / dx
    r2 = (cov * cov) / (dx * dy) if dy > 0 else None
    return (n, round(slope, 6), round((sy - slope * sx) / n, 6),
            round(r2, 6) if r2 is not None else None)


def _run(spark, texts, k=1000):
    r = textqc.zipf_fit(_docs(spark, texts), k=k).collect()[0]
    return (r["n_terms"], r["slope_r"], r["intercept_r"], r["r2_r"])


def test_perfect_zipf_slope_minus_one(spark):
    # freq(w_r) = 60/r for ranks 1..5 -> exact slope -1, r2 = 1
    words = []
    for r, w in enumerate("aa bb cc dd ee".split(), 1):
        words += [w] * (60 // r)
    got = _run(spark, [" ".join(words)])
    assert got[0] == 5
    assert abs(got[1] + 1.0) < 1e-4
    assert abs(got[3] - 1.0) < 1e-6


def test_matches_bruteforce(spark):
    vocab = "the a of to and in is it for on".split()
    texts, x = [], 21
    for _ in range(20):
        ws = []
        for _ in range(40):
            x = (x * 1103515245 + 12345) % (2**31)
            ws.append(vocab[x % len(vocab)] * (1 + x % 2))
        texts.append(" ".join(ws))
    want = _brute(texts, 8)
    got = _run(spark, texts, k=8)
    assert got[0] == want[0]
    for i in (1, 2, 3):
        assert abs(got[i] - want[i]) < 2e-6, i


def test_degenerate_single_term(spark):
    got = _run(spark, ["solo solo solo"])
    assert got == (1, None, None, None)


def test_uniform_frequencies_fit_zero_slope(spark):
    got = _run(spark, ["aa bb cc dd"])
    assert got[0] == 4
    assert abs(got[1]) < 1e-9  # all freq 1 -> flat line
    assert got[3] is None  # zero y-variance -> r2 undefined


def test_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        textqc.zipf_fit(_docs(spark, ["x"]), k=1)


def test_heaps_fit_brute_force(spark):
    import math
    import re as _re

    rows = []
    texts = {
        "s0": ["alpha beta gamma alpha", "delta beta"],
        "s1": ["a b c d e f g h i j k l m n o p q r"],
        "s2": ["one two three one two one " * 5],
    }
    i = 0
    for srcname, ts in texts.items():
        for t in ts:
            rows.append((i, srcname, t))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = textqc.heaps_fit(df, group_col="source").collect()[0]

    pts = []
    for srcname, ts in texts.items():
        toks = [w for t in ts for w in _re.findall(r"[a-z0-9]+", t.lower())]
        pts.append((math.log(len(toks)), math.log(len(set(toks)))))
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts); syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    dx = n * sxx - sx * sx; dy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    beta = cov / dx
    assert got["n_points"] == 3
    assert got["beta_r"] == round(beta, 6)
    assert got["lnk_r"] == round((sy - beta * sx) / n, 6)
    assert got["r2_r"] == round(cov * cov / (dx * dy), 6)


def test_heaps_fit_degenerate(spark):
    df = spark.createDataFrame(
        [(0, "only", "words here"), (1, "only", "more words")],
        "doc_id long, source string, text string",
    )
    row = textqc.heaps_fit(df, group_col="source").collect()[0]
    assert row["n_points"] == 1
    assert row["beta_r"] is None and row["lnk_r"] is None and row["r2_r"] is None
    # empty slices excluded entirely
    df2 = spark.createDataFrame(
        [(0, "a", None), (1, "b", "")], "doc_id long, source string, text string"
    )
    assert textqc.heaps_fit(df2, group_col="source").collect()[0]["n_points"] == 0


# ---- Good-Turing / Chao1 vocabulary richness (vocab_richness) ----------


def test_vocab_richness_hand_computation(spark):
    # slice s: tokens a a a b b c d → N=7, V=4, f1={c,d}=2, f2={b}=1
    # chao1 = 4 + 2·1/(2·2) = 4.5; unseen = 2/7; coverage = 5/7
    df = spark.createDataFrame(
        [(0, "s", "a a a b b"), (1, "s", "c d")],
        "doc_id long, source string, text string",
    )
    r = textqc.vocab_richness(df, group_col="source").collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_tokens"] == 7 and row["v_types"] == 4
    assert row["f1"] == 2 and row["f2"] == 1
    assert row["chao1_r"] == pytest.approx(4.5)
    assert row["unseen_mass_r"] == pytest.approx(round(2 / 7, 6))
    assert row["coverage_r"] == pytest.approx(round(1 - 2 / 7, 6))


def test_vocab_richness_brute_force_and_groups(spark):
    rows = [
        (0, "x", "the quick brown fox jumps over the lazy dog the end"),
        (1, "x", "pack my box with five dozen quick jugs"),
        (2, "y", "aa bb aa bb aa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in textqc.vocab_richness(df, group_col="source").collect()}
    for src in ("x", "y"):
        toks = []
        for _, s, t in rows:
            if s == src:
                toks += re.findall(r"[a-z0-9]+", t.lower())
        cnt = Counter(toks)
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        assert got[src]["n_tokens"] == len(toks)
        assert got[src]["v_types"] == len(cnt)
        assert got[src]["chao1_r"] == pytest.approx(
            round(len(cnt) + f1 * (f1 - 1) / (2 * (f2 + 1)), 6)
        )
        assert got[src]["unseen_mass_r"] == pytest.approx(round(f1 / len(toks), 6))
    # every-type-singleton slice: unseen mass 1 early in a crawl of y'
    # is the keep-crawling signal; saturated y has f1=0 → coverage 1
    assert got["y"]["f1"] == 0
    assert got["y"]["coverage_r"] == pytest.approx(1.0)


def test_vocab_richness_empty_slices_absent(spark):
    df = spark.createDataFrame(
        [(0, "a", None), (1, "b", ""), (2, "c", "one tok")],
        "doc_id long, source string, text string",
    )
    got = textqc.vocab_richness(df, group_col="source").collect()
    assert [r["source"] for r in got] == ["c"]
