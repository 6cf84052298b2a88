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
    assert row.strategy == "basic"  # metadata.strategy = result.strategy.type
    assert row.complete is True
    assert row.text == textops.strip_html_to_text(html)
    meta = textops.extract_html_metadata(html)
    assert row.title == meta["title"] and row.description == meta["description"]


def test_scrape_document_pdf_heuristic_branch(spark):
    row = scrape.scrape_document(
        _pages_df(spark, [("https://x.test/file.pdf", "%PDF-1.7 not html")])
    ).first()
    # reference ELSE-with-isPdf: type pdf, text = the RAW content, no
    # metadata, strategy = the scraper's type (scrapeDocument.ts:300-319)
    assert row.strategy == "basic" and row.is_pdf is True
    assert row.text == "%PDF-1.7 not html"
    assert row.type == "application/pdf" and row.title is None


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
    reg.register(PlatformAdapter(type="preset-type", name="preset"))
    df = spark.createDataFrame(
        [
            ("https://one.test/one", b"", None),
            ("https://x.test/", b"", "preset-type"),
            ("https://y.test/", b"", "never-registered"),
        ],
        "url string, html binary, src_type string",
    )
    out = {r.url: (r.detected_type, r.detected_confidence) for r in reg.resolve(df, type_col="src_type").collect()}
    assert out["https://one.test/one"] == ("t1", "high")
    # a REGISTERED preset bypasses detection (registry.ts:161-162)
    assert out["https://x.test/"] == ("preset-type", "high")
    # an unregistered preset falls through to detection (no match, no fallback)
    assert out["https://y.test/"] == (None, None)


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


def test_fetch_items_extracts_platform_items(spark):
    """fetchItems (registry.ts:174-187): one source row → N item rows via
    the resolved adapter's item extraction; hrefs absolutized and
    keep-first deduped in document order."""
    from spider_spark.platform import default_registry

    html = (
        b'<a href="/dl/report.pdf?wpdmdl=7">Report</a>'
        b'<a href="/other/file.zip">zip</a>'
        b'<a href="/dl/report.pdf?wpdmdl=7">dup</a>'
        b'<a href="/dl/minutes.pdf">Minutes</a>'
    )
    df = spark.createDataFrame(
        [("https://a.test/download/x", html)], "url string, html binary"
    )
    rows = default_registry().fetch_items(df).orderBy("item_pos").collect()
    assert [(r.item_pos, r.item_url, r.item_text, r.detected_type) for r in rows] == [
        (0, "https://a.test/dl/report.pdf?wpdmdl=7", "Report", "wordpress-download-manager"),
        (1, "https://a.test/dl/minutes.pdf", "Minutes", "wordpress-download-manager"),
    ]
    assert all(r.error is None for r in rows)


def test_fetch_items_preset_bypass_and_validation_error(spark):
    """registry.spec.ts:200-212: a preset source.type naming a registered
    adapter is fetched without detection; an unresolvable source becomes a
    validation_error row (the row-wise ValidationError of registry.ts:181-185)."""
    from spider_spark.platform import AdapterRegistry, PlatformAdapter

    reg = AdapterRegistry()  # no fallback
    reg.register(PlatformAdapter(
        type="wordpress-download-manager", name="WPDM", priority=100,
        url_pattern=r"/download/", item_href_pattern=r"wpdmdl=\d+|\.pdf",
    ))
    html = b'<a href="/f.pdf">F</a>'
    df = spark.createDataFrame(
        [
            ("https://x.test/plain", html, "wordpress-download-manager"),  # preset bypass
            ("https://y.test/plain", html, None),  # unresolvable
        ],
        "url string, html binary, src_type string",
    )
    rows = reg.fetch_items(df, type_col="src_type").collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(r)
    preset = by_url["https://x.test/plain"]
    assert [(r.item_url, r.error) for r in preset] == [("https://x.test/f.pdf", None)]
    bad = by_url["https://y.test/plain"]
    assert [(r.item_url, r.error) for r in bad] == [(None, "validation_error")]


def test_fetch_items_civicweb_and_docushare_patterns(spark):
    from spider_spark.platform import default_registry

    df = spark.createDataFrame(
        [
            (
                "https://b.civicweb.net/filepro/documents/?preview=9",
                b'<a href="/filepro/document/9/Agenda 9.pdf">A</a><a href="/elsewhere/x.pdf">no</a>',
            ),
            (
                "https://c.test/docushare/dsweb/Get/Document-5",
                b'<a href="/dsweb/Get/Document-5/Min 5.xlsx">M</a><a href="/dsweb/other.txt">no</a>',
            ),
        ],
        "url string, html binary",
    )
    rows = default_registry().fetch_items(df).collect()
    got = {(r.detected_type, r.item_url) for r in rows}
    assert got == {
        ("civicweb", "https://b.civicweb.net/filepro/document/9/Agenda%209.pdf"),
        ("docushare", "https://c.test/dsweb/Get/Document-5/Min%205.xlsx"),
    }


# --- downloads as first-class data (download-utils.ts, scrapeDocument branch 1)


def test_materialize_download_branches(spark):
    """handlePlaywrightDownload (download-utils.ts:80-113) branch-exact,
    expectations from download-utils.test.ts:36-83."""
    from spider_spark import udfs

    df = spark.createDataFrame(
        [
            ("https://example.com/agenda.pdf", "agenda.pdf", b"pdf content", None),
            ("https://example.com/agenda.pdf", "agenda.pdf", None, None),
            ("https://example.com/agenda.pdf", "agenda.pdf", None, "permission denied"),
        ],
        "url string, filename string, content binary, err string",
    )
    rows = df.select(
        udfs.materialize_download(
            F.col("url"), F.col("filename"), F.col("content"), F.col("err")
        ).alias("d")
    ).collect()
    ok, nopath, thrown = [r.d for r in rows]
    assert (ok.url, ok.filename, ok.content_type, bytes(ok.content), ok.error) == (
        "https://example.com/agenda.pdf", "agenda.pdf", "application/pdf", b"pdf content", None,
    )
    assert (nopath.content_type, nopath.content, nopath.error) == (
        "application/pdf", None, "Download path not available",
    )
    assert (thrown.content_type, thrown.content, thrown.error) == (
        None, None, "permission denied",
    )


def test_col_infer_content_type_and_download_error(spark):
    """download-utils.test.ts:22-34 + :85-89 through the Catalyst forms."""
    from spider_spark import udfs

    df = spark.createDataFrame(
        [("AGENDA.PDF",), ("archive.unknown",), (None,), ("minutes.docx",)],
        "filename string",
    )
    got = [r.ct for r in df.select(udfs.col_infer_content_type(F.col("filename")).alias("ct")).collect()]
    assert got == [
        "application/pdf",
        "application/octet-stream",
        "application/octet-stream",
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    ]
    errs = spark.createDataFrame(
        [("page.goto: Download is starting",), ("net::ERR_ABORTED at navigation",),
         ("socket hang up",), (None,)],
        "msg string",
    )
    flags = [r.e for r in errs.select(udfs.col_is_download_error(F.col("msg")).alias("e")).collect()]
    assert flags == [True, True, False, False]
    assert textops.is_download_error("page.goto: Download is starting") is True
    assert textops.is_download_error("socket hang up") is False


def test_scrape_document_download_branch(spark):
    """scrapeDocument branch 1 (scrapeDocument.ts:259-281), expectations
    mirroring scrapeDocument.test.ts:172-193: url = download.url, type from
    filename, title = filename, empty text, complete only when bytes
    arrived without error."""
    from spider_spark import udfs

    rows = [
        ("https://site.test/download/file.pdf",
         [("https://cdn.test/file.pdf", "file.pdf", None, b"%PDF-", None)]),
        ("https://site.test/download/broken.pdf",
         [("https://cdn.test/broken.pdf", "broken.pdf", None, None, "Download path not available")]),
    ]
    from pyspark.sql.types import ArrayType, StructType, StructField, StringType, BinaryType
    schema = StructType([
        StructField("url", StringType()),
        StructField("downloads", ArrayType(udfs.DOWNLOAD_STRUCT)),
    ])
    df = spark.createDataFrame(rows, schema).withColumn("html", F.lit(b""))
    out = {r.url: r for r in scrape.scrape_document(df, downloads_col="downloads").collect()}
    ok = out["https://site.test/download/file.pdf"]
    assert ok.is_download is True and ok.strategy == "direct-download"
    assert ok.doc_url == "https://cdn.test/file.pdf"
    assert ok.type == "application/pdf" and ok.title == "file.pdf"
    assert ok.text == "" and ok.is_pdf is True and ok.complete is True
    assert bytes(ok.file_content) == b"%PDF-"
    bad = out["https://site.test/download/broken.pdf"]
    assert bad.complete is False and bad.is_download is True
    assert bad.error is None if hasattr(bad, "error") else True


# --- named link-merge operators (crawlee.ts:154-163, crawl4ai.ts:66-100) ----


def test_merge_expanded_final_keep_first(spark):
    """The expanded pass wins for a shared href; final-only links append."""
    expanded = spark.createDataFrame(
        [("p1", "https://a/x", 0, "expanded-X"), ("p1", "https://a/y", 1, "expanded-Y")],
        "url string, href string, pos int, text string",
    )
    final = spark.createDataFrame(
        [("p1", "https://a/x", 0, "final-X"), ("p1", "https://a/z", 1, "final-Z")],
        "url string, href string, pos int, text string",
    )
    out = scrape.merge_expanded_final_links(expanded, final).orderBy("pass_ord", "pos")
    got = [(r.href, r.text, r.pass_ord) for r in out.collect()]
    assert got == [
        ("https://a/x", "expanded-X", 0),  # first writer (expanded) wins
        ("https://a/y", "expanded-Y", 0),
        ("https://a/z", "final-Z", 1),
    ]


def test_merge_internal_external_keep_first(spark):
    internal = spark.createDataFrame(
        [("p", "https://s/a", 0, "int-A")], "url string, href string, pos int, text string"
    )
    external = spark.createDataFrame(
        [("p", "https://s/a", 0, "ext-A"), ("p", "https://other/b", 1, "ext-B")],
        "url string, href string, pos int, text string",
    )
    out = scrape.merge_internal_external_links(internal, external)
    got = {(r.href, r.text) for r in out.collect()}
    assert got == {("https://s/a", "int-A"), ("https://other/b", "ext-B")}


# --- adapter fetch variants (dom.ts:54-163, crawl4ai.ts:130-292) ------------


def test_dom_fetch_pages_normalizes_and_keeps_request_url(spark):
    html = "<HTML><Body><a href='/x' class=one>X</a></Body></HTML>"
    out = scrape.dom_fetch_pages(_pages_df(spark, [("https://req.test/page", html)])).first()
    assert out.content == textops.normalize_html(html)  # parser round-trip
    assert out.url == "https://req.test/page"  # request URL preserved (dom.ts:132)
    # links resolve against the request url
    assert out.parsed.links[0].href == "https://req.test/x"


def test_crawl4ai_pages_prefers_cleaned_html_and_markdown(spark):
    df = spark.createDataFrame(
        [
            ("https://a.test/", "<p>cleaned</p><a href='/c'>c</a>", "<p>raw</p>", "md-string"),
            ("https://b.test/", None, "<a href='/r'>r</a>", None),
        ],
        "url string, cleaned_html string, html string, markdown string",
    )
    rows = {r.url: r for r in scrape.crawl4ai_pages(df).collect()}
    a = rows["https://a.test/"]
    assert "cleaned" in a.content and a.markdown == "md-string"
    assert a.parsed.links[0].href == "https://a.test/c"
    b = rows["https://b.test/"]
    assert b.content == "<a href='/r'>r</a>"  # fallback to html (coalesce)
    assert b.markdown is None


def test_crawl4ai_markdown_struct_fit_preference(spark):
    df = spark.createDataFrame(
        [("https://a.test/", "<p>x</p>", "<p>x</p>", ("FIT", "RAW")),
         ("https://b.test/", "<p>y</p>", "<p>y</p>", (None, "RAW"))],
        "url string, cleaned_html string, html string, "
        "markdown struct<fit_markdown:string, raw_markdown:string>",
    )
    rows = {r.url: r.markdown for r in scrape.crawl4ai_pages(df).collect()}
    assert rows == {"https://a.test/": "FIT", "https://b.test/": "RAW"}


def test_adapter_context_fetch_and_scrape(spark):
    """AdapterContext (types.ts:46-55): the injected I/O surface — fetch
    resolves against the page store; scrape_index extracts links."""
    from spider_spark.platform import AdapterContext

    pages = _pages_df(spark, [("https://s.test/", '<a href="/d.pdf">D</a>')])
    ctx = AdapterContext(pages=pages)
    urls = spark.createDataFrame([("https://s.test/",), ("https://miss.test/",)], "url string")
    fetched = {r.url: r.html for r in ctx.fetch_page(urls).collect()}
    assert fetched["https://s.test/"] is not None and fetched["https://miss.test/"] is None
    links = ctx.scrape_index(pages).collect()
    assert [r.href for r in links] == ["https://s.test/d.pdf"]


def test_adapter_context_ai_seam(spark):
    """types.ts:52 — the optional untyped ``ai?`` hook: unbound contexts
    refuse ask_ai with a clear error; a bound fake client receives the
    frame and prompt and its result flows back."""
    import pytest as _pytest

    from pyspark.sql import functions as F
    from spider_spark.platform import AdapterContext

    urls = spark.createDataFrame([("https://s.test/a",)], "url string")
    with _pytest.raises(ValueError, match="no ai client"):
        AdapterContext().ask_ai(urls, "label these")

    seen = {}

    def fake_ai(df, prompt):
        seen["prompt"] = prompt
        return df.withColumn("ai_label", F.lit("doc"))

    ctx = AdapterContext(ai=fake_ai)
    out = ctx.ask_ai(urls, "label these").collect()
    assert seen["prompt"] == "label these"
    assert [(r.url, r.ai_label) for r in out] == [("https://s.test/a", "doc")]


def test_adapter_parity_same_fixture_all_adapters(spark):
    """index.spec.ts:70-99: the same page through every adapter yields the
    same absolute links with consistent metadata. Here: the simple path
    (raw html) vs the dom path (normalized html) vs crawl4ai (cleaned_html
    = same content) must extract identical link sets and metadata."""
    from tests.conftest import fixture_text

    url = "https://docs.acme-town.org/download/budget-2026/"
    html = fixture_text("links_page.html")
    pages = _pages_df(spark, [(url, html)])

    simple = scrape.parse_pages(pages).select("parsed").first().parsed
    dom = scrape.dom_fetch_pages(pages).select("parsed").first().parsed
    c4 = scrape.crawl4ai_pages(
        pages.withColumn("cleaned_html", F.col("html").cast("string"))
    ).select("parsed").first().parsed

    for other in (dom, c4):
        assert [l.href for l in other.links] == [l.href for l in simple.links]
        assert [l.text for l in other.links] == [l.text for l in simple.links]
        assert other.title == simple.title and other.description == simple.description


def test_registry_fetch_failure_fallback_and_unregister(spark):
    """registry.spec.ts:161-172: when the HTML phase cannot run (fetch
    failed ⇒ html_col=None), URL-phase misses fall to the fallback type at
    'low'; plus unregister/has bookkeeping (registry.ts:54-66)."""
    reg = default_registry()
    assert reg.has("civicweb") is True
    df = spark.createDataFrame([("https://plain.test/page",)], "url string")
    out = reg.detect(df, html_col=None).first()
    assert (out.detected_type, out.detected_confidence) == ("generic", "low")
    assert reg.unregister("civicweb") is True
    assert reg.unregister("civicweb") is False  # already gone
    assert reg.has("civicweb") is False
    # a civicweb URL now falls through to fallback
    df2 = spark.createDataFrame(
        [("https://x.civicweb.net/filepro/documents/?preview=1",)], "url string"
    )
    assert reg.detect(df2, html_col=None).first().detected_type == "generic"


def test_get_fetch_adapter_factory_dispatch(spark):
    """getSpider factory semantics (factory.ts:79-104): known adapters
    dispatch; unknown raise."""
    url, html = "https://f.test/", '<a href="/l">L</a>'
    for name in ("simple", "dom", "crawl4ai"):
        fn = scrape.get_fetch_adapter(name)
        df = _pages_df(spark, [(url, html)])
        if name == "crawl4ai":
            df = df.withColumn("cleaned_html", F.col("html").cast("string"))
        out = fn(df).first()
        assert out.parsed.links[0].href == "https://f.test/l"
    with pytest.raises(ValueError, match="unknown spider adapter"):
        scrape.get_fetch_adapter("crawlee-typo")


def test_crawl4ai_json_response_parsing(spark):
    """Crawl4aiResponse JSON → Page (crawl4ai.ts:21-33, 60-109, 114-125,
    217-243): cleaned_html preference, polymorphic markdown, server links
    internal-then-external with keep-first on the resolved href, and the
    extraction fallback when the server gives no links."""
    import json

    srv = json.dumps({
        "success": True,
        "html": "<p>raw</p>",
        "cleaned_html": "<p>clean</p>",
        "status_code": 200,
        "markdown": {"fit_markdown": None, "raw_markdown": "RAW-MD"},
        "links": {
            "internal": [{"href": "/a", "text": " A ", "title": "tA"}],
            "external": [
                {"href": "https://s.test/a", "text": "dup-of-a", "title": None},
                {"href": "https://other/b", "text": "B", "title": None},
            ],
        },
    })
    no_links = json.dumps({
        "success": True, "html": "<a href='/fallback'>F</a>", "cleaned_html": None,
        "status_code": 200, "markdown": "PLAIN-MD", "links": {"internal": [], "external": []},
    })
    df = spark.createDataFrame(
        [("https://s.test/page", srv), ("https://t.test/page", no_links)],
        "url string, response_json string",
    )
    rows = {r.url: r for r in scrape.crawl4ai_pages_from_json(df).collect()}
    a = rows["https://s.test/page"]
    assert a.content == "<p>clean</p>" and a.markdown == "RAW-MD"
    assert a.link_source == "server"
    # internal '/a' resolves to the same href as the external absolute dup
    assert [(l.href, l.text) for l in a.links] == [
        ("https://s.test/a", "A"), ("https://other/b", "B"),
    ]
    b = rows["https://t.test/page"]
    assert b.content == "<a href='/fallback'>F</a>" and b.markdown == "PLAIN-MD"
    assert b.link_source == "extracted"
    assert [l.href for l in b.links] == ["https://t.test/fallback"]


def test_crawl4ai_empty_cleaned_html_falls_back(spark):
    """crawl4ai.ts:243 is JS `||`: empty-string cleaned_html falls through
    to the raw html (falsy fallback, not null-only coalesce)."""
    df = spark.createDataFrame(
        [("https://e.test/", "", "<a href='/x'>x</a>", None)],
        "url string, cleaned_html string, html string, markdown string",
    )
    row = scrape.crawl4ai_pages(df).first()
    assert row.content == "<a href='/x'>x</a>"
    assert row.parsed.links[0].href == "https://e.test/x"


def test_crawl4ai_json_failed_fetch_and_final_url(spark):
    """success=false → error row, never a normal page (crawl4ai.ts:235-241);
    success=true uses the response's final url as the link base
    (crawl4ai.ts:246)."""
    import json

    bad = json.dumps({"success": False, "html": "<a href='/err'>err</a>",
                      "error_message": "boom", "links": {"internal": [], "external": []}})
    redirected = json.dumps({
        "success": True, "url": "https://final.test/landed",
        "html": "<a href='/rel'>R</a>", "cleaned_html": "",
        "links": {"internal": [], "external": []},
    })
    df = spark.createDataFrame(
        [("https://req.test/a", bad), ("https://req.test/b", redirected)],
        "url string, response_json string",
    )
    rows = {r.url: r for r in scrape.crawl4ai_pages_from_json(df).collect()}
    b = rows["https://req.test/a"]
    assert b.fetch_error == "boom" and b.content is None and b.links == []
    g = rows["https://req.test/b"]
    assert g.fetch_error is None and g.final_url == "https://final.test/landed"
    # empty cleaned_html fell back to html; links resolve against final url
    assert [l.href for l in g.links] == ["https://final.test/rel"]


def test_fetch_adapter_registry_extension_point(spark):
    """SpiderAdapter extension point: a custom fetch variant registers
    under a new name, dispatches like a built-in, rejects duplicates
    (registry.ts:64-69 discipline), and unregisters cleanly."""

    def archive_fetch(pages, url_col="url", html_col="html"):
        return pages.withColumn("content", F.upper(F.col(html_col).cast("string"))).select(
            url_col, "content"
        )

    scrape.register_fetch_adapter("archive", archive_fetch)
    try:
        with pytest.raises(ValueError, match="already registered"):
            scrape.register_fetch_adapter("archive", archive_fetch)
        scrape.register_fetch_adapter("archive", archive_fetch, replace=True)
        df = _pages_df(spark, [("https://f.test/", "<p>hi</p>")])
        out = scrape.get_fetch_adapter("archive")(df).first()
        assert out.content == "<P>HI</P>"
    finally:
        scrape.unregister_fetch_adapter("archive")
    with pytest.raises(ValueError, match="unknown spider adapter"):
        scrape.get_fetch_adapter("archive")
