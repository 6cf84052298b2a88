"""DataFrame-level scrape operators, cache read-through, platform registry,
env config — engine forms of the reference entry points (SURVEY.md §3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark import cache as cache_ops
from spider_spark import config as cfg_ops
from spider_spark import scrape, textops
from spider_spark.platform import AdapterRegistry, PlatformAdapter, default_registry
from tests.conftest import fixture_text


def _pages_df(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows], "url string, html binary"
    )


# --- scrape_index / filter_links_df / find_document_links -------------------


def test_scrape_index_matches_scalar_extractor(spark):
    url = "https://docs.acme-town.org/download/budget-2026/"
    html = fixture_text("links_page.html")
    out = scrape.scrape_index(_pages_df(spark, [(url, html)])).orderBy("pos").collect()
    expected = textops.extract_html_links(html, url)
    assert [r.href for r in out] == [l.href for l in expected]
    assert [r.text for r in out] == [l.text for l in expected]


def test_filter_links_df_include_exclude_semantics(spark):
    url = "https://a.test/"
    html = (
        '<a href="/docs/report.pdf">Annual Report</a>'
        '<a href="/about">About us</a>'
        '<a href="/docs/minutes.pdf">Old MINUTES</a>'
        '<a href="/docs/report.pdf">dup</a>'
    )
    links = scrape.scrape_index(_pages_df(spark, [(url, html)]))
    kept = scrape.filter_links_df(
        links, {"urlContains": ["docs"], "excludes": ["minutes"]}
    ).orderBy("pos")
    assert [r.href for r in kept.collect()] == ["https://a.test/docs/report.pdf"]


def test_find_document_links(spark):
    url = "https://t.test/"
    html = (
        '<a href="/a.pdf">a</a><a href="/b.docx">b</a>'
        '<a href="/c.png">c</a><a href="/a.pdf">dup</a><a href="/d">d</a>'
    )
    out = scrape.find_document_links(_pages_df(spark, [(url, html)]))
    hrefs = sorted(r.href for r in out.collect())
    assert hrefs == ["https://t.test/a.pdf", "https://t.test/b.docx"]


# --- scrape_document 4-branch CASE ------------------------------------------


def test_scrape_document_detector_branch_reenqueue(spark):
    url = "https://docs.acme-town.org/download/budget-2026/"
    html = fixture_text("wpdm_page.html")
    row = scrape.scrape_document(_pages_df(spark, [(url, html)])).first()
    assert row.strategy == "wordpress-pdf-link"
    assert row.doc_url == "https://docs.acme-town.org/download/budget-2026.pdf?wpdmdl=777&refresh=zz9"
    assert row.complete is False  # re-enqueue signal (scrapeDocument.ts:283-298)
    assert row.is_pdf is True and row.type == "application/pdf"


def test_scrape_document_text_branch_byte_identical(spark):
    url = "https://news.example.org/article"
    html = fixture_text("normal_article.html")
    row = scrape.scrape_document(_pages_df(spark, [(url, html)])).first()
    assert row.strategy == "html-text"
    assert row.complete is True
    assert row.text == textops.strip_html_to_text(html)
    meta = textops.extract_html_metadata(html)
    assert row.title == meta["title"] and row.description == meta["description"]


def test_scrape_document_pdf_heuristic_branch(spark):
    row = scrape.scrape_document(
        _pages_df(spark, [("https://x.test/file.pdf", "%PDF-1.7 not html")])
    ).first()
    assert row.strategy == "pdf-page" and row.is_pdf is True and row.text == ""


def test_scrape_document_normalizes_download_url(spark):
    # normalizeDownloadPageUrl: /download/ without slash/query/ext gains '/'
    row = scrape.scrape_document(
        _pages_df(spark, [("https://d.test/download/pack", "<html></html>")])
    ).first()
    assert row.url == "https://d.test/download/pack/"


# --- cache read-through ------------------------------------------------------


def test_cache_key_matches_scalar(spark):
    urls = ["https://a.test/x", "https://b.test/y?q=1"]
    df = spark.createDataFrame([(u,) for u in urls], "url_canon string")
    got = {r.url_canon: r.k for r in df.select("url_canon", cache_ops.col_cache_key("url_canon", "simple").alias("k")).collect()}
    for u in urls:
        assert got[u] == textops.create_cache_key("simple", u)


def test_read_through_hits_and_misses_with_ttl(spark):
    frontier = spark.createDataFrame([("https://a.test/1",), ("https://a.test/2",)], "url_canon string")
    cached = spark.createDataFrame([("https://a.test/1",)], "url_canon string").select(
        cache_ops.col_cache_key("url_canon").alias("cache_key"),
        F.current_timestamp().alias("cached_at"),
        F.lit("payload").alias("body"),
    )
    hits, misses = cache_ops.read_through(frontier, cached)
    assert [r.url_canon for r in hits.collect()] == ["https://a.test/1"]
    assert [r.url_canon for r in misses.collect()] == ["https://a.test/2"]
    # expired cache row ⇒ everything is a miss
    stale = cached.withColumn("cached_at", F.expr("current_timestamp() - INTERVAL 1 HOUR"))
    hits2, misses2 = cache_ops.read_through(frontier, stale, ttl_ms=300_000)
    assert hits2.count() == 0 and misses2.count() == 2


def test_read_through_no_cache_table(spark):
    frontier = spark.createDataFrame([("https://a.test/1",)], "url_canon string")
    hits, misses = cache_ops.read_through(frontier, None)
    assert hits.count() == 0 and misses.count() == 1


# --- platform registry -------------------------------------------------------


def test_registry_two_phase_and_priority(spark):
    reg = default_registry()
    df = spark.createDataFrame(
        [
            ("https://a.test/download/x", b"<html></html>"),          # phase1 wpdm
            ("https://b.test/page", b"window.wpdm_view_count = 1"),   # phase2 wpdm
            ("https://c.test/page", b"plain"),                        # fallback
            ("https://meet.civicweb.net/filepro/documents/?preview=1", b""),  # phase1 civicweb
        ],
        "url string, html binary",
    )
    out = {r.url: (r.detected_type, r.detected_confidence) for r in reg.detect(df).collect()}
    assert out["https://a.test/download/x"] == ("wordpress-download-manager", "high")
    assert out["https://b.test/page"] == ("wordpress-download-manager", "medium")
    assert out["https://c.test/page"] == ("generic", "low")
    assert out["https://meet.civicweb.net/filepro/documents/?preview=1"] == ("civicweb", "high")


def test_registry_duplicate_rejected_and_preset_bypass(spark):
    reg = AdapterRegistry()
    reg.register(PlatformAdapter(type="t1", name="one", url_pattern="one"))
    with pytest.raises(ValueError):
        reg.register(PlatformAdapter(type="t1", name="dup"))
    df = spark.createDataFrame(
        [("https://one.test/one", b"", None), ("https://x.test/", b"", "preset-type")],
        "url string, html binary, src_type string",
    )
    out = {r.url: (r.detected_type, r.detected_confidence) for r in reg.resolve(df, type_col="src_type").collect()}
    assert out["https://one.test/one"] == ("t1", "high")
    assert out["https://x.test/"] == ("preset-type", "high")  # registry.ts:161-162


def test_registry_priority_order():
    reg = AdapterRegistry()
    reg.register(PlatformAdapter(type="late", name="late", priority=300, url_pattern="x"))
    reg.register(PlatformAdapter(type="early", name="early", priority=100, url_pattern="x"))
    assert [a.type for a in reg.all()] == ["early", "late"]


# --- env config --------------------------------------------------------------


def test_env_config_precedence():
    env = {"HAVE_SPIDER_TIMEOUT": "5000", "HAVE_SPIDER_USER_AGENT": "bot/1", "HAVE_SPIDER_MAX_REQUESTS": "9"}
    got = cfg_ops.load_env_config({}, env)
    assert (got.timeout, got.user_agent, got.max_requests) == (5000, "bot/1", 9)
    # user wins over env (README.md:336-354)
    got = cfg_ops.load_env_config({"timeout": 1000, "user_agent": "me"}, env)
    assert (got.timeout, got.user_agent) == (1000, "me")
    # invalid env values ignored
    got = cfg_ops.load_env_config({}, {"HAVE_SPIDER_TIMEOUT": "abc"})
    assert got.timeout == cfg_ops.DEFAULT_TIMEOUT_MS


# --- DOM-adapter normalize + max_requests budget -----------------------------


def test_normalize_html_roundtrip_idempotent():
    html = '<html><body><p class="a">Hi &amp; bye</p><br><img src="x.png"></body></html>'
    once = textops.normalize_html(html)
    assert textops.normalize_html(once) == once  # idempotent
    assert "Hi &amp; bye" in once and '<p class="a">' in once


def test_normalize_html_preserves_text_extraction():
    html = fixture_text("normal_article.html")
    assert textops.strip_html_to_text(textops.normalize_html(html)) == textops.strip_html_to_text(html)


def test_max_requests_budget_enforced(spark, tmp_path):
    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    pages = synth.generate_pages(spark, 200, n_hosts=6)
    cfg = CrawlConfig(per_host_budget=4, max_requests=10, respect_robots=False)
    c = Crawler(spark, pages, str(tmp_path / "ck"), cfg)
    stats = c.run(synth.seed_urls(200, 6), max_ticks=8)
    fetched = sum(s.fetched for s in stats)
    # the budget stops the run at the first tick boundary past the cap
    assert fetched >= 10
    assert fetched <= 10 + 6 * 4  # at most one extra tick's worth
    # a resumed run with the same cap does nothing
    c2 = Crawler(spark, pages, str(tmp_path / "ck"), cfg)
    assert c2.run(max_ticks=8) == []
