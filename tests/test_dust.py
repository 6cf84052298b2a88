"""DUST junk-param rule learning (operators/dust.py, Bar-Yossef WWW'07
restated pair-free) and reciprocal-link nepotism stats (graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import dust, graph

H = "https://ex.test"
PAGES = [
    # sess never changes content (fp tracks id): evidence groups id=1, id=2
    (f"{H}/a?id=1&sess=x", "A"),
    (f"{H}/a?id=1&sess=y", "A"),
    (f"{H}/a?id=2&sess=z", "B"),
    (f"{H}/a?id=2&sess=w", "B"),
    # shared sess across different ids -> counterexample for id
    (f"{H}/a?id=1&sess=s", "A"),
    (f"{H}/a?id=2&sess=s", "B"),
]


@pytest.fixture(scope="module")
def pages_df(spark):
    return spark.createDataFrame(PAGES, "url string, content_fp string")


def test_dust_learns_junk_and_respects_counterexamples(spark, pages_df):
    rules = {
        (r.host, r.param): (r.evidence_groups, r.counter_groups, r.is_junk)
        for r in dust.dust_param_rules(pages_df).collect()
    }
    assert rules[("ex.test", "sess")] == (2, 0, True)
    ev, ct, junk = rules[("ex.test", "id")]
    assert ct >= 1 and not junk


def test_dust_min_support_floor(spark, pages_df):
    rules = {
        r.param: r.is_junk
        for r in dust.dust_param_rules(pages_df, min_support=3).collect()
    }
    assert rules["sess"] is False  # only 2 evidence groups


def test_dust_rules_are_per_host(spark):
    # same param name, different hosts: one junk, one countered
    rows = [
        ("https://a.test/p?u=1", "X"),
        ("https://a.test/p?u=2", "X"),
        ("https://a.test/q?u=3", "Y"),
        ("https://a.test/q?u=4", "Y"),
        ("https://b.test/p?u=1", "P"),
        ("https://b.test/p?u=2", "Q"),
    ]
    df = spark.createDataFrame(rows, "url string, content_fp string")
    rules = {
        (r.host, r.param): r.is_junk for r in dust.dust_param_rules(df).collect()
    }
    assert rules[("a.test", "u")] is True
    assert rules[("b.test", "u")] is False


def test_dust_ignores_fragment_and_no_query_urls(spark):
    rows = [
        ("https://c.test/x?t=1#frag=notparam", "A"),
        ("https://c.test/x?t=2#z", "A"),
        ("https://c.test/plain", "B"),
    ]
    df = spark.createDataFrame(rows, "url string, content_fp string")
    rules = dust.dust_param_rules(df).collect()
    assert {r.param for r in rules} == {"t"}


def test_strip_junk_params_apply(spark, pages_df):
    rules = dust.dust_param_rules(pages_df)
    out = {
        r.url: r.url_dusted
        for r in dust.strip_junk_params(pages_df, rules).collect()
    }
    assert out[f"{H}/a?id=1&sess=x"] == f"{H}/a?id=1"
    assert out[f"{H}/a?id=2&sess=s"] == f"{H}/a?id=2"


def test_strip_junk_params_all_stripped_and_foreign_host(spark, pages_df):
    rules = dust.dust_param_rules(pages_df)
    extra = spark.createDataFrame(
        [
            (f"{H}/only?sess=zz", "C"),  # every param junk -> bare base
            ("https://other.test/k?sess=1", "D"),  # no rules for host
        ],
        "url string, content_fp string",
    )
    out = {r.url: r.url_dusted for r in dust.strip_junk_params(extra, rules).collect()}
    assert out[f"{H}/only?sess=zz"] == f"{H}/only"
    assert out["https://other.test/k?sess=1"] == "https://other.test/k?sess=1"


def test_reciprocal_link_stats(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("a", "c")],  # dup edge collapses
        "src_host string, dst_host string",
    )
    got = {
        r.host: (r.n_out, r.n_recip, r.recip_ratio)
        for r in graph.reciprocal_link_stats(e).collect()
    }
    assert got["a"] == (2, 1, 0.5)
    assert got["b"] == (1, 1, 1.0)
    assert "c" not in got  # no out-edges
