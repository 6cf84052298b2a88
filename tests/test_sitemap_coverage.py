"""Per-host sitemap coverage audit (sitemap.sitemap_coverage)."""

from __future__ import annotations

from spider_spark import sitemap as sm


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _run(spark, crawled, locs):
    out = sm.sitemap_coverage(
        _df(spark, crawled, "host string, url_canon string"),
        _df(spark, locs, "host string, loc string"),
    )
    return {
        r["host"]: (
            r["n_listed"],
            r["n_crawled"],
            r["n_both"],
            r["n_crawled_only"],
            r["n_listed_only"],
            r["coverage_r"],
        )
        for r in out.collect()
    }


def test_three_way_partition(spark):
    crawled = [("a", "u1"), ("a", "u2"), ("a", "u3")]
    locs = [("a", "u2"), ("a", "u3"), ("a", "u4")]
    got = _run(spark, crawled, locs)
    assert got == {"a": (3, 3, 2, 1, 1, round(2 / 3, 6))}


def test_dedup_both_sides(spark):
    crawled = [("a", "u1"), ("a", "u1")]
    locs = [("a", "u1"), ("a", "u1"), ("a", "u2")]
    got = _run(spark, crawled, locs)
    assert got == {"a": (2, 1, 1, 0, 1, 0.5)}


def test_host_without_sitemap_has_null_coverage(spark):
    got = _run(spark, [("b", "u1")], [("a", "u1")])
    assert got["b"] == (0, 1, 0, 1, 0, None)
    assert got["a"] == (1, 0, 0, 0, 1, 0.0)


def test_same_url_on_two_hosts_does_not_cross(spark):
    crawled = [("a", "u"), ("b", "u")]
    locs = [("a", "u")]
    got = _run(spark, crawled, locs)
    assert got["a"] == (1, 1, 1, 0, 0, 1.0)
    assert got["b"] == (0, 1, 0, 1, 0, None)
