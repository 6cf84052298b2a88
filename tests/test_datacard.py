"""Corpus data-card rollup (operators/datacard.py): hand-computed
differential on a tiny corpus, rollup-level arithmetic consistency,
and partitioning invariance."""

from __future__ import annotations

import pytest

from spider_spark.operators import datacard

DOCS = [
    # (doc_id, source, lang, text)
    (1, "web", "en", "one two three"),
    (2, "web", "en", "a " * 40),          # 40 tokens -> not short
    (3, "web", "de", "ein zwei"),
    (4, "books", "en", "w " * 2000),      # long doc
    (5, "books", "en", ""),               # 0 tokens -> short
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, source string, lang string, text string"
    )


def _card(spark, docs):
    return {
        (r.source, r.lang): r for r in datacard.corpus_datacard(docs).collect()
    }


def test_exact_groups_hand_computed(spark, docs):
    card = _card(spark, docs)
    web_en = card[("web", "en")]
    assert web_en.level == 0
    assert web_en.n_docs == 2
    assert web_en.n_tokens == 3 + 40
    assert web_en.n_chars == len("one two three") + len("a " * 40)
    assert web_en.short_docs == 1  # the 3-token doc
    assert web_en.long_docs == 0
    assert web_en.max_tokens == 40
    assert web_en.mean_tokens_r == pytest.approx(21.5)
    books_en = card[("books", "en")]
    assert books_en.long_docs == 1 and books_en.short_docs == 1


def test_rollup_levels_are_sums_of_children(spark, docs):
    card = _card(spark, docs)
    web_all = card[("web", datacard.ALL)]
    assert web_all.level == 1
    assert web_all.n_docs == card[("web", "en")].n_docs + card[("web", "de")].n_docs
    grand = card[(datacard.ALL, datacard.ALL)]
    assert grand.level == 3
    assert grand.n_docs == len(DOCS)
    assert grand.n_tokens == sum(
        r.n_tokens for (s, l), r in card.items() if r.level == 0
    )
    # rollup(source, lang) has exactly 3 levels: 0, 1, 3 (never lang-only)
    assert {r.level for r in card.values()} == {0, 1, 3}


def test_single_shuffle_plan(spark, docs):
    plan = (
        datacard.corpus_datacard(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Expand" in plan  # grouping sets computed in ONE pass


def test_partitioning_invariance(spark, docs):
    a = sorted(map(tuple, datacard.corpus_datacard(docs.repartition(1)).collect()))
    b = sorted(map(tuple, datacard.corpus_datacard(docs.repartition(7)).collect()))
    assert a == b
