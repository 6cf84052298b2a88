"""Unigram-LM perplexity scoring (CCNet-style): LM probabilities sum to
<1 with reserved OOV mass, cross-entropy matches a hand computation, OOV
handling, vocab pruning, and bucket assignment."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from spider_spark.operators import lm as lmod


@pytest.fixture()
def tiny(spark):
    return spark.createDataFrame(
        [(0, "a a b"), (1, "a b c"), (2, "c c c d")],
        "doc_id long, text string",
    )


def test_unigram_lm_probabilities(tiny):
    # counts: a=3 b=2 c=4 d=1, total=10, V=4, alpha=0.5 → denom 12.5
    got = {r["token"]: r["log_prob"] for r in lmod.unigram_lm(tiny).collect()}
    assert got.keys() == {"a", "b", "c", "d"}
    assert got["a"] == pytest.approx(math.log(3.5 / 12.5))
    assert got["d"] == pytest.approx(math.log(1.5 / 12.5))
    unk = lmod.unigram_lm(tiny).select("unk_log_prob").first()[0]
    assert unk == pytest.approx(math.log(0.5 / 12.5))


def test_doc_cross_entropy_matches_hand_computation(spark, tiny):
    lm = lmod.unigram_lm(tiny)
    scored = {
        r["doc_id"]: r
        for r in lmod.doc_cross_entropy(tiny, lm).collect()
    }
    lp = {
        "a": math.log(3.5 / 12.5),
        "b": math.log(2.5 / 12.5),
        "c": math.log(4.5 / 12.5),
        "d": math.log(1.5 / 12.5),
    }
    want0 = -(2 * lp["a"] + lp["b"]) / 3
    assert scored[0]["ce_nats"] == pytest.approx(want0)
    assert scored[0]["n_tokens"] == 3
    assert scored[0]["ppl"] == pytest.approx(math.exp(want0))
    want2 = -(3 * lp["c"] + lp["d"]) / 4
    assert scored[2]["ce_nats"] == pytest.approx(want2)


def test_oov_tokens_take_unk_mass(spark, tiny):
    lm = lmod.unigram_lm(tiny)
    probe = spark.createDataFrame([(9, "a zzz")], "doc_id long, text string")
    r = lmod.doc_cross_entropy(probe, lm).first()
    unk = math.log(0.5 / 12.5)
    want = -(math.log(3.5 / 12.5) + unk) / 2
    assert r["ce_nats"] == pytest.approx(want)
    # inner-join mode skips the OOV token instead
    r2 = lmod.doc_cross_entropy(probe, lm, use_unk=False).first()
    assert r2["ce_nats"] == pytest.approx(-math.log(3.5 / 12.5))
    assert r2["n_tokens"] == 1


def test_empty_docs_absent_and_lowercasing(spark, tiny):
    lm = lmod.unigram_lm(tiny)
    probe = spark.createDataFrame(
        [(1, "  "), (2, "A B")], "doc_id long, text string"
    )
    rows = lmod.doc_cross_entropy(probe, lm).collect()
    assert {r["doc_id"] for r in rows} == {2}  # empty doc not scored
    # "A B" scores as "a b"
    want = -(math.log(3.5 / 12.5) + math.log(2.5 / 12.5)) / 2
    assert rows[0]["ce_nats"] == pytest.approx(want)


def test_top_k_vocab_prunes_to_most_probable(tiny):
    lm = lmod.unigram_lm(tiny)
    kept = {r["token"] for r in lmod.top_k_vocab(lm, 2).collect()}
    assert kept == {"c", "a"}  # counts 4 and 3


def test_perplexity_buckets_fixed_and_estimated(spark, tiny):
    lm = lmod.unigram_lm(tiny)
    scored = lmod.doc_cross_entropy(tiny, lm)
    fixed = {
        r["doc_id"]: r["ppl_bucket"]
        for r in lmod.perplexity_buckets(scored, thresholds=(1.2, 1.4)).collect()
    }
    # doc2 (all-frequent c's) has the lowest ce → head under these cuts
    ce = {r["doc_id"]: r["ce_nats"] for r in scored.collect()}
    for d, b in fixed.items():
        want = "head" if ce[d] < 1.2 else ("middle" if ce[d] < 1.4 else "tail")
        assert b == want
    est = lmod.perplexity_buckets(scored)  # percentile-estimated thresholds
    assert est.filter(F.col("ppl_bucket").isin("head", "middle", "tail")).count() == 3
    with pytest.raises(ValueError):
        lmod.perplexity_buckets(scored, thresholds=(2.0, 1.0))


def test_perplexity_bucket_boundaries_are_half_open(spark):
    """Ties AT a cut point: strict < below each threshold, so ce == t_head
    → middle and ce == t_tail → tail (the documented half-open contract —
    a ±1-ulp float would flip an inclusive rule nondeterministically
    across engines)."""
    scored = spark.createDataFrame(
        [(1, 0.9), (2, 1.0), (3, 1.1), (4, 2.0), (5, 2.5)],
        "doc_id int, ce_nats double",
    )
    got = {
        r.doc_id: r.ppl_bucket
        for r in lmod.perplexity_buckets(scored, thresholds=(1.0, 2.0)).collect()
    }
    assert got == {1: "head", 2: "middle", 3: "middle", 4: "tail", 5: "tail"}
    # degenerate equal cuts: middle band is empty, boundary value → tail
    eq = {
        r.doc_id: r.ppl_bucket
        for r in lmod.perplexity_buckets(scored, thresholds=(1.0, 1.0)).collect()
    }
    assert eq == {1: "head", 2: "tail", 3: "tail", 4: "tail", 5: "tail"}


def test_perplexity_empty_docs_never_reach_bucketing(spark):
    """Empty/whitespace-only docs have no tokens → doc_cross_entropy emits
    no row → bucketing never sees them (CCNet drops empties upstream)."""
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "   \n\t ")], "doc_id int, text string"
    )
    lm = lmod.unigram_lm(docs)
    scored = lmod.doc_cross_entropy(docs, lm)
    out = lmod.perplexity_buckets(scored, thresholds=(1.0, 2.0))
    assert {r.doc_id for r in out.collect()} == {1}


# ---------------------------------------------------------------------------
# Stupid Backoff (Brants et al. 2007)


@pytest.fixture()
def sb_reference(spark):
    # trigrams: "a b c"×2, "b c d"×1; bigrams: ab×2 bc×2 cd×1 ... etc.
    return spark.createDataFrame(
        [(0, "a b c d"), (2, "a b c")], "doc_id long, text string"
    )


def _sb_hand(ref_docs: list[str], probe: list[str], alpha=0.4, lid=0.5):
    """Pure-Python Stupid Backoff for the expected values."""
    from collections import Counter

    toks = [d.lower().split() for d in ref_docs]
    uni, bi, tri = Counter(), Counter(), Counter()
    for t in toks:
        uni.update(t)
        bi.update(zip(t, t[1:]))
        tri.update(zip(t, t[1:], t[2:]))
    n_total, v = sum(uni.values()), len(uni)
    out = []
    for i in range(len(probe) - 2):
        w1, w2, w3 = probe[i], probe[i + 1], probe[i + 2]
        if tri[(w1, w2, w3)]:
            s = tri[(w1, w2, w3)] / bi[(w1, w2)]
        elif bi[(w2, w3)]:
            s = alpha * bi[(w2, w3)] / uni[w2]
        else:
            s = alpha * alpha * (uni.get(w3, 0) + lid) / (n_total + lid * (v + 1))
        out.append(math.log(s))
    return len(out), -sum(out) / len(out)


def test_stupid_backoff_trigram_hit_branch(spark, sb_reference):
    probe = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    r = lmod.doc_stupid_backoff(probe, sb_reference).first()
    n, want = _sb_hand(["a b c d", "a b c"], ["a", "b", "c", "d"])
    assert r["n_trigrams"] == n == 2
    assert r["sb_nats"] == pytest.approx(want)
    # both trigrams occur in the reference → pure relative frequencies
    assert want == pytest.approx(-(math.log(2 / 2) + math.log(1 / 2)) / 2)


def test_stupid_backoff_bigram_and_oov_branches(spark, sb_reference):
    # "x b c": trigram (x,b,c) unseen, bigram (b,c) seen → α·c(bc)/c(b)
    # "a b zzz": trigram+bigram unseen, zzz OOV → α²·(0+λ)/(N+λ(V+1))
    probe = spark.createDataFrame(
        [(1, "x b c"), (3, "a b zzz")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r for r in lmod.doc_stupid_backoff(probe, sb_reference).collect()
    }
    ref = ["a b c d", "a b c"]
    n1, want1 = _sb_hand(ref, ["x", "b", "c"])
    assert got[1]["n_trigrams"] == n1 == 1
    assert got[1]["sb_nats"] == pytest.approx(want1)
    assert want1 == pytest.approx(-math.log(0.4 * 2 / 2))
    n3, want3 = _sb_hand(ref, ["a", "b", "zzz"])
    assert got[3]["sb_nats"] == pytest.approx(want3)
    # N=7 tokens, V=4 → OOV mass 0.16·0.5/(7+2.5)
    assert want3 == pytest.approx(-math.log(0.16 * 0.5 / 9.5))


def test_stupid_backoff_short_docs_emit_no_row(spark, sb_reference):
    probe = spark.createDataFrame(
        [(1, "a b"), (3, ""), (5, "a b c")], "doc_id long, text string"
    )
    got = lmod.doc_stupid_backoff(probe, sb_reference).collect()
    assert [r["doc_id"] for r in got] == [5]


def test_stupid_backoff_no_broadcast_path_matches(spark, sb_reference):
    probe = spark.createDataFrame(
        [(1, "a b c d"), (3, "x b c")], "doc_id long, text string"
    )
    a = lmod.doc_stupid_backoff(probe, sb_reference, broadcast=True).collect()
    b = lmod.doc_stupid_backoff(probe, sb_reference, broadcast=False).collect()
    key = lambda r: r["doc_id"]
    for ra, rb in zip(sorted(a, key=key), sorted(b, key=key)):
        assert ra["doc_id"] == rb["doc_id"]
        assert ra["sb_nats"] == pytest.approx(rb["sb_nats"])


def test_ngram_counts_orders(spark, sb_reference):
    tri = {
        (r["w1"], r["w2"], r["w3"]): r["c"]
        for r in lmod.ngram_counts(sb_reference, 3).collect()
    }
    assert tri == {("a", "b", "c"): 2.0, ("b", "c", "d"): 1.0}


# ---- interpolated Kneser-Ney (doc_kneser_ney) --------------------------


def _kn_hand(ref_docs, probe, d=0.75, lid=0.5):
    """Pure-Python mirror of doc_kneser_ney's formula (Chen & Goodman
    1998 eq. 4.26-4.27 with the module's Lidstone-floored continuation
    distribution)."""
    import math
    from collections import Counter

    bi = Counter()
    for t in (doc.lower().split() for doc in ref_docs):
        bi.update(zip(t, t[1:]))
    ctx_c, fert, cont = Counter(), Counter(), Counter()
    for (w1, w2), c in bi.items():
        ctx_c[w1] += c
        fert[w1] += 1
        cont[w2] += 1
    b_types, vc = len(bi), len(cont)
    denom = b_types + lid * (vc + 1)
    out = []
    for w1, w2 in zip(probe, probe[1:]):
        p_cont = (cont.get(w2, 0) + lid) / denom
        if w1 in ctx_c:
            p = (max(bi.get((w1, w2), 0) - d, 0.0) + d * fert[w1] * p_cont) / ctx_c[w1]
        else:
            p = p_cont
        out.append(math.log(p))
    return len(out), -sum(out) / len(out)


@pytest.fixture()
def kn_reference(spark):
    # bigrams: (a,b)x2 (b,c)x2 (c,d)x1 → B=3 types, Vc=3, denom=5
    return spark.createDataFrame(
        [(0, "a b c d"), (2, "a b c")], "doc_id long, text string"
    )


def test_kneser_ney_seen_and_backoff_branches(spark, kn_reference):
    # "a b": seen bigram → (max(2-.75,0) + .75·1·(1.5/5)) / 2 = 0.7375
    # "b d": unseen bigram, seen context → .75·1·(1.5/5) / 2 = 0.1125
    probe = spark.createDataFrame(
        [(1, "a b"), (3, "b d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in lmod.doc_kneser_ney(probe, kn_reference).collect()}
    for doc_id, toks in [(1, ["a", "b"]), (3, ["b", "d"])]:
        n, want = _kn_hand(["a b c d", "a b c"], toks)
        assert got[doc_id]["n_bigrams"] == n == 1
        assert got[doc_id]["kn_nats"] == pytest.approx(want)
    import math

    assert got[1]["kn_nats"] == pytest.approx(-math.log(0.7375))
    assert got[3]["kn_nats"] == pytest.approx(-math.log(0.1125))


def test_kneser_ney_unseen_context_and_continuation(spark, kn_reference):
    # "x c": context x unseen → full back-off to Pcont(c) = 1.5/5 = 0.3
    # "c zzz": continuation zzz unseen → .75·1·(0.5/5) / 1 = 0.075
    probe = spark.createDataFrame(
        [(1, "x c"), (3, "c zzz")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in lmod.doc_kneser_ney(probe, kn_reference).collect()}
    import math

    assert got[1]["kn_nats"] == pytest.approx(-math.log(0.3))
    assert got[3]["kn_nats"] == pytest.approx(-math.log(0.075))
    for doc_id, toks in [(1, ["x", "c"]), (3, ["c", "zzz"])]:
        _, want = _kn_hand(["a b c d", "a b c"], toks)
        assert got[doc_id]["kn_nats"] == pytest.approx(want)


def test_kneser_ney_continuation_beats_raw_frequency(spark):
    # the KN insight: "francisco" is FREQUENT (high unigram count) but
    # completes only one context, so in a NOVEL context its probability
    # must fall below an equally-frequent token with many contexts.
    ref = spark.createDataFrame(
        [
            (0, "san francisco san francisco san francisco"),
            (2, "a the b the c the"),
        ],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(1, "zzz francisco"), (3, "zzz the")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in lmod.doc_kneser_ney(probe, ref).collect()}
    # both probes back off fully (zzz unseen); cont(the)=3 > cont(francisco)=1
    assert got[3]["kn_nats"] < got[1]["kn_nats"]


def test_kneser_ney_short_docs_and_discount_validation(spark, kn_reference):
    probe = spark.createDataFrame(
        [(1, "a"), (3, ""), (5, "a b c")], "doc_id long, text string"
    )
    got = lmod.doc_kneser_ney(probe, kn_reference).collect()
    assert [r["doc_id"] for r in got] == [5]
    with pytest.raises(ValueError):
        lmod.doc_kneser_ney(probe, kn_reference, discount=1.5)


def test_kneser_ney_no_broadcast_path_matches(spark, kn_reference):
    probe = spark.createDataFrame(
        [(1, "a b c d"), (3, "x b zzz")], "doc_id long, text string"
    )
    a = lmod.doc_kneser_ney(probe, kn_reference, broadcast=True).collect()
    b = lmod.doc_kneser_ney(probe, kn_reference, broadcast=False).collect()
    key = lambda r: r["doc_id"]
    for ra, rb in zip(sorted(a, key=key), sorted(b, key=key)):
        assert ra["doc_id"] == rb["doc_id"]
        assert ra["kn_nats"] == pytest.approx(rb["kn_nats"])
