"""Sitemap protocol extraction (sitemaps.org): urlset/sitemapindex blocks,
XML entity unescape ordering, seed derivation, crawler composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark import sitemap

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://s.test/page?a=1&amp;b=2</loc>
    <lastmod>2024-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc> https://s.test/bare </loc></url>
  <url><lastmod>2024-01-06</lastmod></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://s.test/sitemap-a.xml</loc><lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>https://s.test/sitemap-b.xml</loc></sitemap>
</sitemapindex>"""


def _df(spark, *bodies):
    return spark.createDataFrame(
        [(f"https://s.test/sm{i}.xml", b) for i, b in enumerate(bodies)],
        "url string, xml string",
    )


def test_urlset_entries(spark):
    rows = sitemap.sitemap_entries(_df(spark, URLSET), "xml").orderBy("pos").collect()
    assert [r.loc for r in rows] == ["https://s.test/page?a=1&b=2", "https://s.test/bare"]
    assert rows[0].sitemap_kind == "urlset"
    assert rows[0].lastmod == "2024-01-05"
    assert rows[0].changefreq == "daily"
    assert rows[0].priority == 0.8
    assert rows[1].lastmod is None and rows[1].priority is None
    # the loc-less third block was dropped (loc is required by spec)


def test_sitemapindex_entries(spark):
    rows = sitemap.sitemap_entries(_df(spark, INDEX), "xml").orderBy("pos").collect()
    assert [r.loc for r in rows] == [
        "https://s.test/sitemap-a.xml",
        "https://s.test/sitemap-b.xml",
    ]
    assert all(r.sitemap_kind == "sitemapindex" for r in rows)


def test_garbage_priority_yields_null_not_crash(spark):
    # Spark 4 runs ANSI by default: a plain cast would abort the job on
    # <priority>high</priority>; try_cast must yield NULL instead
    bad = "<urlset><url><loc>https://s.test/x</loc><priority>high</priority></url></urlset>"
    rows = sitemap.sitemap_entries(_df(spark, bad), "xml").collect()
    assert len(rows) == 1 and rows[0].priority is None


def test_non_sitemap_yields_no_rows(spark):
    assert sitemap.sitemap_entries(_df(spark, "<html><body>hi</body></html>"), "xml").count() == 0


def test_xml_unescape_amp_last(spark):
    # '&amp;lt;' must decode to the literal '&lt;', not double-decode to '<'
    df = spark.range(1).select(sitemap.xml_unescape(F.lit("x &amp;lt; y &apos;q&apos;")).alias("v"))
    assert df.collect()[0].v == "x &lt; y 'q'"


def test_urlset_seed_urls_keep_first_and_default_priority(spark):
    dup = """<urlset>
      <url><loc>https://s.test/dup</loc><priority>0.2</priority></url>
      <url><loc>https://s.test/dup</loc><priority>0.9</priority></url>
      <url><loc>https://s.test/other</loc></url>
    </urlset>"""
    seeds = {
        r.url: r.sitemap_priority
        for r in sitemap.urlset_seed_urls(
            sitemap.sitemap_entries(_df(spark, dup), "xml")
        ).collect()
    }
    assert seeds == {"https://s.test/dup": 0.9, "https://s.test/other": 0.5}


def test_robots_sitemap_directive(spark):
    from spider_spark import robots

    body = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: https://s.test/sitemap.xml\n"
        "sitemap:https://s.test/sitemap2.xml\n"
        "Sitemap: https://s.test/sitemap.xml\n"  # dupe → keep-first
    )
    # scalar
    assert robots.sitemap_urls(body) == [
        "https://s.test/sitemap.xml",
        "https://s.test/sitemap2.xml",
    ]
    assert robots.sitemap_urls(None) == []
    # Catalyst parity
    df = spark.createDataFrame([("s.test", body), ("empty.test", "User-agent: *\n")],
                               "host string, robots_txt string")
    rows = robots.sitemap_urls_from_bodies(df).orderBy("host", "pos").collect()
    assert [(r.host, r.pos, r.sitemap_url) for r in rows] == [
        ("s.test", 0, "https://s.test/sitemap.xml"),
        ("s.test", 1, "https://s.test/sitemap2.xml"),
    ]


def test_sitemap_seeds_feed_the_frontier(spark):
    from spider_spark.frontier import CrawlConfig, seeds_to_frontier

    entries = sitemap.sitemap_entries(_df(spark, URLSET), "xml")
    urls = [r.url for r in sitemap.urlset_seed_urls(entries).collect()]
    fr = seeds_to_frontier(spark, sorted(urls), CrawlConfig())
    got = {r.url_canon for r in fr.collect()}
    assert "https://s.test/bare" in got and any("a=1" in u for u in got)


def test_revalidation_candidates_reason_chain(spark):
    from spider_spark.sitemap import revalidation_candidates, sitemap_entries

    xml = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://s.test/new</loc><lastmod>2024-01-05</lastmod></url>"
        "<url><loc>https://s.test/changed</loc><lastmod>2024-02-01</lastmod></url>"
        "<url><loc>https://s.test/fresh</loc><lastmod>2024-01-01</lastmod></url>"
        "<url><loc>https://s.test/stale</loc><changefreq>daily</changefreq></url>"
        "<url><loc>https://s.test/calm</loc><changefreq>yearly</changefreq></url>"
        "<url><loc>https://s.test/never</loc><changefreq>never</changefreq></url>"
        "<url><loc>https://s.test/nometa</loc></url>"
        "</urlset>"
    )
    entries = sitemap_entries(
        spark.createDataFrame([("https://s.test/sm.xml", xml)], "url string, xml string")
    )
    last_crawl = spark.createDataFrame(
        [
            ("https://s.test/changed", "2024-01-15 00:00:00"),
            ("https://s.test/fresh", "2024-01-15 00:00:00"),
            ("https://s.test/stale", "2024-01-15 00:00:00"),
            ("https://s.test/calm", "2024-01-15 00:00:00"),
            ("https://s.test/never", "2020-01-01 00:00:00"),
            ("https://s.test/nometa", "2020-01-01 00:00:00"),
        ],
        "url string, ts string",
    ).select("url", F.to_timestamp("ts").alias("last_crawled_at"))
    got = {
        r.url: r.reason
        for r in revalidation_candidates(entries, last_crawl, "2024-03-01 00:00:00").collect()
    }
    assert got == {
        "https://s.test/new": "never_crawled",
        "https://s.test/changed": "modified",  # lastmod after last capture
        "https://s.test/stale": "stale_changefreq",  # daily, 45 days ago
        # fresh: lastmod BEFORE last capture -> no row
        # calm: yearly period not yet elapsed -> no row
        # never/nometa: no lastmod, no usable changefreq -> no row
    }


def test_revalidation_lastmod_authoritative_over_changefreq(spark):
    """When lastmod is present it decides alone — an ancient changefreq
    must not resurrect an up-to-date entry."""
    from spider_spark.sitemap import revalidation_candidates, sitemap_entries

    xml = (
        "<urlset><url><loc>https://s.test/a</loc><lastmod>2024-01-01</lastmod>"
        "<changefreq>hourly</changefreq></url></urlset>"
    )
    entries = sitemap_entries(
        spark.createDataFrame([("sm", xml)], "url string, xml string")
    )
    last_crawl = spark.createDataFrame(
        [("https://s.test/a",)], "url string"
    ).select("url", F.to_timestamp(F.lit("2024-01-15 00:00:00")).alias("last_crawled_at"))
    assert revalidation_candidates(entries, last_crawl, "2024-06-01 00:00:00").count() == 0


def test_crawler_sitemap_revalidate_end_to_end(spark, tmp_path):
    """Full loop: crawl, publish a sitemap whose lastmod post-dates the
    crawl for one URL and pre-dates it for another - exactly one requeue."""
    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig
    from spider_spark.sitemap import sitemap_entries

    pages = synth.generate_pages(spark, 150, n_hosts=5)
    c = Crawler(spark, pages, str(tmp_path / "ck"), CrawlConfig(per_host_budget=12))
    c.run(synth.seed_urls(150, 5), max_ticks=20)
    u1, u2 = [
        r.url_canon
        for r in c.results().filter("status = 200").orderBy("url_canon").limit(2).collect()
    ]
    xml = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"<url><loc>{u1}</loc><lastmod>2100-01-01</lastmod></url>"
        f"<url><loc>{u2}</loc><lastmod>1999-01-01</lastmod></url>"
        "</urlset>"
    )
    entries = sitemap_entries(
        spark.createDataFrame([("sm", xml)], "url string, xml string")
    )
    assert c.sitemap_revalidate(entries, "2100-06-01 00:00:00") == 1
    # the requeued URL is fetched exactly once more on resume
    before = c.results().filter(F.col("url_canon") == u1).count()
    c.run(max_ticks=c.catalog.committed_tick() + 2)
    assert c.results().filter(F.col("url_canon") == u1).count() == before + 1
    assert c.results().filter(F.col("url_canon") == u2).count() == 1


# ---- capture-recapture host-size estimation ----------------------------


def test_host_url_space_estimate_chapman_arithmetic(spark):
    from spider_spark import sitemap as sm

    # host A: listed {u0..u9} (10), crawled {u6..u13} (8), both {u6..u9} (4)
    # Chapman: 11·9/5 − 1 = 18.8; union = 14 → undiscovered 4.8
    crawled = spark.createDataFrame(
        [("A", f"u{i}") for i in range(6, 14)], "host string, url_canon string"
    )
    listed = spark.createDataFrame(
        [("A", f"u{i}") for i in range(10)], "host string, loc string"
    )
    r = sm.host_url_space_estimate(crawled, listed).collect()[0]
    assert (r["n_listed"], r["n_crawled"], r["n_both"], r["n_union"]) == (10, 8, 4, 14)
    assert r["chapman_est_r"] == pytest.approx(18.8)
    assert r["undiscovered_est_r"] == pytest.approx(4.8)


def test_host_url_space_estimate_zero_overlap_and_floor(spark):
    from spider_spark import sitemap as sm

    # host B: disjoint samples → no recapture → null estimate
    # host C: complete overlap → N-hat = 3·3/3−1 = 2 < union 2 → floor 0
    crawled = spark.createDataFrame(
        [("B", "u1"), ("B", "u2"), ("C", "x1"), ("C", "x2")],
        "host string, url_canon string",
    )
    listed = spark.createDataFrame(
        [("B", "u3"), ("C", "x1"), ("C", "x2")], "host string, loc string"
    )
    got = {r["host"]: r for r in sm.host_url_space_estimate(crawled, listed).collect()}
    assert got["B"]["chapman_est_r"] is None
    assert got["B"]["undiscovered_est_r"] is None
    assert got["C"]["chapman_est_r"] == pytest.approx(2.0)
    assert got["C"]["undiscovered_est_r"] == pytest.approx(0.0)
