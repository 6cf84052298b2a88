"""KL term drift (textqc.term_drift_kl) and politeness-aware frontier ETA
(adaptive.frontier_eta)."""

from __future__ import annotations

import math
import re

import pandas as pd
import pytest

from spider_spark.operators import adaptive, textqc


def _brute_kl(prev_texts, curr_texts, alpha=0.5):
    def census(texts):
        c = {}
        for t in texts:
            for w in re.split(r"[^a-z0-9]+", t.lower()):
                if w:
                    c[w] = c.get(w, 0) + 1
        return c

    p, q = census(prev_texts), census(curr_texts)
    vocab = set(p) | set(q)
    np_, nc, v = sum(p.values()), sum(q.values()), len(vocab)
    contrib = {}
    for t in vocab:
        qq = (q.get(t, 0) + alpha) / (nc + alpha * v)
        pp = (p.get(t, 0) + alpha) / (np_ + alpha * v)
        contrib[t] = qq * math.log(qq / pp)
    return contrib


def test_term_drift_kl_matches_bruteforce(spark):
    prev_texts = ["alpha beta gamma", "alpha beta", "delta epsilon"]
    curr_texts = ["alpha spamword spamword", "spamword beta", "alpha"]
    prev = spark.createDataFrame(pd.DataFrame({"text": prev_texts}))
    curr = spark.createDataFrame(pd.DataFrame({"text": curr_texts}))
    rows = textqc.term_drift_kl(prev, curr, top_contributors=50).collect()
    got = {r["term"]: r["kl_r"] for r in rows}
    contrib = _brute_kl(prev_texts, curr_texts)
    assert got["__TOTAL__"] == pytest.approx(sum(contrib.values()), abs=2e-6)
    for t, c in contrib.items():
        assert got[t] == pytest.approx(c, abs=2e-6), t
    # the planted newcomer dominates the drift
    top_term = max(contrib, key=lambda t: abs(contrib[t]))
    assert top_term == "spamword" and got["spamword"] > 0


def test_term_drift_identical_corpora_near_zero(spark):
    texts = ["same words here", "and here too"]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    rows = {r["term"]: r["kl_r"] for r in textqc.term_drift_kl(df, df).collect()}
    assert rows["__TOTAL__"] == pytest.approx(0.0, abs=1e-6)
    with pytest.raises(ValueError):
        textqc.term_drift_kl(df, df, alpha=0)


def test_frontier_eta_arithmetic(spark):
    frontier = spark.createDataFrame(
        pd.DataFrame(
            {"host": ["deep"] * 100 + ["shallow"] * 5 + ["capped"] * 40}
        )
    )
    budgets = spark.createDataFrame(
        pd.DataFrame({"host": ["capped"], "budget": [4]})
    )
    got = {
        r["host"]: r
        for r in adaptive.frontier_eta(
            frontier, budgets, default_budget=16
        ).collect()
    }
    assert got["deep"]["eta_ticks"] == 7  # ceil(100/16)
    assert got["shallow"]["eta_ticks"] == 1
    assert got["capped"]["budget"] == 4 and got["capped"]["eta_ticks"] == 10
    # the makespan host is the deep-or-capped one, never raw volume
    assert got["capped"]["eta_ticks"] > got["deep"]["eta_ticks"]
    with pytest.raises(ValueError):
        adaptive.frontier_eta(frontier, default_budget=0)


def test_tokenizer_fertility_literals(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["plain words here", "url-soup:x9//q?a=1", ""],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {r["doc_id"]: r for r in textqc.tokenizer_fertility(df).collect()}
    # 'plain words here': 3 words, 3 pieces → fertility 1.0
    assert got[0]["n_words"] == 3 and got[0]["n_pieces"] == 3
    assert got[0]["fertility_r"] == 1.0
    # punctuation soup shreds: pieces >> words
    assert got[1]["n_words"] == 1 and got[1]["n_pieces"] > 4
    assert got[1]["fertility_r"] > 4
    # empty doc: zero counts, null ratios
    assert got[2]["n_words"] == 0 and got[2]["n_pieces"] == 0
    assert got[2]["fertility_r"] is None and got[2]["chars_per_piece_r"] is None
