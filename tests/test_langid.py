"""Trained char-n-gram NB language ID (operators/langid.py).

A from-scratch Python NB restates the exact formula for a tiny corpus
(score-level differential, not just argmax); separability and edge
cases (gram-less docs, ties, partitioning invariance) pin behavior.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import langid

EN = [
    "the quick brown fox jumps over the lazy dog and then rests there",
    "this is another english sentence with the usual words and things",
    "where there is the will there is the way for all of the people",
]
DE = [
    "der schnelle braune fuchs springt ueber den faulen hund und ruht",
    "dies ist ein weiterer deutscher satz mit den ueblichen woertern",
    "wo ein wille ist da ist auch ein weg fuer alle die leute dort",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t, "en") for i, t in enumerate(EN)] + [
        (100 + i, t, "de") for i, t in enumerate(DE)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _py_nb(train_rows, n=3, alpha=0.5, max_chars=1000):
    """Literal restatement of the train formula."""
    gram_counts, label_docs = {}, Counter()
    vocab = set()
    for _, text, label in train_rows:
        label_docs[label] += 1
        head = text[:max_chars]
        for i in range(len(head) - n + 1):
            g = head[i : i + n]
            vocab.add(g)
            gram_counts.setdefault(label, Counter())[g] += 1
    v_all = len(vocab)
    total_docs = sum(label_docs.values())
    model = {}
    for label, cnts in gram_counts.items():
        total = sum(cnts.values())
        denom = total + alpha * (v_all + 1)
        model[label] = {
            "log_prior": math.log(label_docs[label] / total_docs),
            "unk": math.log(alpha / denom),
            "grams": {g: math.log((c + alpha) / denom) for g, c in cnts.items()},
        }
    return model


def _py_score(model, text, n=3, max_chars=1000):
    out = {}
    head = text[:max_chars]
    grams = [head[i : i + n] for i in range(len(head) - n + 1)]
    for label, m in model.items():
        out[label] = m["log_prior"] + sum(
            m["grams"].get(g, m["unk"]) for g in grams
        )
    return out


def test_scores_match_python_reference(spark, corpus):
    grams, labels = langid.train_nb_langid(corpus)
    probe = spark.createDataFrame(
        [(1, "the will of the people"), (2, "der wille der leute")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.pred_label, r.score)
        for r in langid.nb_classify(probe, grams, labels).collect()
    }
    model = _py_nb([(r.doc_id, r.text, r.lang) for r in corpus.collect()])
    for doc_id, text in [(1, "the will of the people"), (2, "der wille der leute")]:
        want = _py_score(model, text)
        best = max(want.items(), key=lambda kv: (kv[1], kv[0]))
        assert got[doc_id][0] == best[0]
        assert got[doc_id][1] == pytest.approx(best[1], rel=1e-9)


def test_separable_langs_recovered(spark, corpus):
    grams, labels = langid.train_nb_langid(corpus)
    preds = langid.nb_classify(corpus, grams, labels)
    conf = langid.langid_accuracy(corpus, preds).collect()
    right = sum(r.n for r in conf if r.label == r.pred_label)
    assert right == corpus.count()  # training-set fit on separable data


def test_gramless_doc_gets_prior_argmax(spark, corpus):
    grams, labels = langid.train_nb_langid(corpus)
    short = spark.createDataFrame([(9, "ab")], "doc_id long, text string")
    got = langid.nb_classify(short, grams, labels).collect()[0]
    # equal doc counts → equal priors → tie breaks to GREATEST label
    assert got.pred_label == "en"
    lp = {r.label: r.log_prior for r in labels.collect()}
    assert got.score == pytest.approx(lp["en"], rel=1e-12)


def test_model_is_a_proper_distribution(spark, corpus):
    grams, labels = langid.train_nb_langid(corpus)
    rows = grams.collect()
    assert all(r.log_prob < 0 for r in rows)
    mass = {}
    for r in rows:
        mass[r.label] = mass.get(r.label, 0.0) + math.exp(r.log_prob)
    # smoothing reserves mass for unseen grams → strictly < 1
    for label, m in mass.items():
        assert 0.5 < m < 1.0, (label, m)


def test_partitioning_invariance(spark, corpus):
    g1, l1 = langid.train_nb_langid(corpus.repartition(1))
    g7, l7 = langid.train_nb_langid(corpus.repartition(7))
    probe = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EN + DE)], "doc_id long, text string"
    )
    a = sorted((r.doc_id, r.pred_label) for r in langid.nb_classify(probe, g1, l1).collect())
    b = sorted((r.doc_id, r.pred_label) for r in langid.nb_classify(probe, g7, l7).collect())
    assert a == b


def test_max_chars_caps_the_explode(spark, corpus):
    grams, labels = langid.train_nb_langid(corpus)
    # a doc whose tail would flip the label if it were read
    text = EN[0] + " " + " ".join([DE[0]] * 50)
    probe = spark.createDataFrame([(5, text)], "doc_id long, text string")
    capped = langid.nb_classify(
        probe, grams, labels, max_chars=len(EN[0])
    ).collect()[0]
    assert capped.pred_label == "en"
    full = langid.nb_classify(probe, grams, labels, max_chars=100000).collect()[0]
    assert full.pred_label == "de"


def test_no_nested_loop_join_in_plan(spark, corpus):
    grams, labels = langid.train_nb_langid(corpus)
    probe = spark.createDataFrame([(1, "the the the")], "doc_id long, text string")
    plan = (
        langid.nb_classify(probe, grams, labels)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
