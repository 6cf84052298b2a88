"""build_urlsets / build_sitemapindex — the write side of the sitemap
loop, round-tripped through the reader."""

from __future__ import annotations

from spider_spark import sitemap as sm

from pyspark.sql import functions as F


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "url_canon string, host string, mod string"
    )


def test_urlset_roundtrips_through_reader(spark):
    rows = [
        (f"https://a.example/p{i}?x=1&y=<2>", "a.example", f"2026-01-{i+1:02d}")
        for i in range(5)
    ]
    us = sm.build_urlsets(_pages(spark, rows), lastmod_col="mod")
    out = us.collect()
    assert len(out) == 1 and out[0]["n_urls"] == 5
    back = sm.sitemap_entries(us.select(F.col("host").alias("url"), "xml")).collect()
    got = {(r["loc"], r["lastmod"]) for r in back}
    assert got == {(u, m) for u, _, m in rows}
    assert all(r["sitemap_kind"] == "urlset" for r in back)


def test_urlset_escapes_the_five_entities_once(spark):
    rows = [("https://h/x?a=1&amp;already", "h", None)]
    xml = sm.build_urlsets(_pages(spark, rows)).collect()[0]["xml"]
    # & escaped first: the pre-escaped input's & also encodes exactly once
    assert "<loc>https://h/x?a=1&amp;amp;already</loc>" in xml


def test_urlsets_shard_at_max_urls(spark):
    rows = [(f"https://h/{i}", "h", None) for i in range(25)]
    us = sm.build_urlsets(_pages(spark, rows), max_urls=10).collect()
    assert len(us) == 3  # ceil(25/10) hash shards
    assert sum(r["n_urls"] for r in us) == 25
    assert all(r["n_urls"] <= 25 for r in us)
    # deterministic: same input -> identical shard assignment
    again = sm.build_urlsets(_pages(spark, rows), max_urls=10).collect()
    assert sorted((r["host"], r["shard"], r["xml"]) for r in us) == sorted(
        (r["host"], r["shard"], r["xml"]) for r in again
    )


def test_urlsets_dedupe_and_null_urls(spark):
    rows = [("https://h/a", "h", None), ("https://h/a", "h", None), (None, "h", None)]
    us = sm.build_urlsets(_pages(spark, rows)).collect()
    assert len(us) == 1 and us[0]["n_urls"] == 1


def test_sitemapindex_lists_every_shard(spark):
    rows = [(f"https://h/{i}", "h", None) for i in range(25)] + [
        ("https://k/only", "k", None)
    ]
    us = sm.build_urlsets(_pages(spark, rows), max_urls=10)
    idx = {r["host"]: r for r in sm.build_sitemapindex(us).collect()}
    assert idx["h"]["n_sitemaps"] == 3
    assert idx["k"]["n_sitemaps"] == 1
    for s in range(3):
        assert f"<loc>https://h/sitemap-{s}.xml</loc>" in idx["h"]["xml"]
    # index parses as a sitemapindex through the reader
    back = sm.sitemap_entries(
        sm.build_sitemapindex(us).select(F.col("host").alias("url"), "xml")
    ).collect()
    assert all(r["sitemap_kind"] == "sitemapindex" for r in back)
    assert sum(1 for r in back if r["url"] == "h") == 3
