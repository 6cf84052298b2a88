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


def test_url_path_dates_conventions(spark):
    from spider_spark.operators.dust import url_path_dates

    cases = [
        ("https://a.test/2024/05/12/post-title", (2024, 5, 12, "ymd")),
        ("https://a.test/blog/2019-12-31.html", (2019, 12, 31, "ymd")),
        ("https://a.test/2024-01-02/", (2024, 1, 2, "ymd")),
        ("https://a.test/archive/2021/07/", (2021, 7, None, "ym")),
        # numeric id is not a date (no separators between components)
        ("https://a.test/p/20240512999/", (None, None, None, None)),
        # out-of-range month/day rejected by the range check
        ("https://a.test/2024/13/40/x", (None, None, None, None)),
        # invalid day falls back to the still-valid monthly prefix
        ("https://a.test/2024/05/99/x", (2024, 5, None, "ym")),
        # century outside 19xx/20xx
        ("https://a.test/1824/05/12/x", (None, None, None, None)),
        # ymd takes precedence over its own ym prefix
        ("https://a.test/2022/03/04/", (2022, 3, 4, "ymd")),
        ("https://a.test/no/date/here", (None, None, None, None)),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: (r["url_year"], r["url_month"], r["url_day"], r["url_date_kind"])
        for r in url_path_dates(df).collect()
    }
    for u, want in cases:
        assert got[u] == want, u


def test_path_template_census_shapes(spark):
    from spider_spark.operators.dust import path_template_census

    urls = [
        "https://a.test/product/1",
        "https://a.test/product/23",
        "https://a.test/product/23?utm=x",     # query ignored → same path
        "https://a.test/cache/00deadbeef1234aa/x",
        "https://a.test/cache/ffeeddccbbaa0099/x",
        # short hex run (<8) stays literal; digits still collapse
        "https://a.test/v2/cafe/9",
        "https://a.test/v2/cafe/77",
        # same template on ANOTHER host counts separately
        "https://b.test/product/5",
        "https://b.test/product/6",
        # singleton template dropped at min_urls=2
        "https://a.test/only-once",
        # no path at all → '/'
        "https://c.test", "https://c.test?x=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r["host"], r["template"]): (r["n_urls"], r["n_distinct_paths"])
        for r in path_template_census(df).collect()
    }
    assert got == {
        ("a.test", "/product/{n}"): (3, 2),
        ("a.test", "/cache/{h}/x"): (2, 2),
        ("a.test", "/v{n}/cafe/{n}"): (2, 2),
        ("b.test", "/product/{n}"): (2, 2),
        ("c.test", "/"): (2, 1),
    }
