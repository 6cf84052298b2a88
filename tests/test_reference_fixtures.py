"""The reference's 17 golden fixtures (testdata/*.html), ported verbatim,
with expected values HARDCODED from the reference's own tests — this locks
the byte-identity surface against regression.

Expectation sources (all /root/reference/):
- src/scrapeDocument.test.ts:20-94   (detector registry, exact URLs incl.
  entity decoding and %20 escaping)
- src/scrapeDocument.test.ts:107-156 (coordinator branches over fixtures)
- src/wordpress-detection.spec.ts:8-81 (wpdmdl anti-loop, trailing slash)
- src/shared/links.test.ts:11-46     (href resolution, keep-first dedupe,
  metadata fields, class splitting)

Fixtures not covered by an explicit reference assertion are checked
differentially against the Node oracle's full detectDocumentUrl chain
(true JS regex/string/WHATWG-URL semantics) — all 17 files, both engines,
byte-for-byte.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from spider_spark import textops
from spider_spark.textops import (
    Link,
    detect_document_url,
    extract_civicweb_document_url,
    extract_docushare_document_url,
    extract_html_links,
    extract_html_metadata,
    extract_wordpress_download_url,
    normalize_download_page_url,
    strip_html_to_text,
)
from spider_spark.urlops import resolve_href

from tests.conftest import HAS_NODE, js_oracle

REF_FIXTURES = Path(__file__).parent / "fixtures" / "reference"

ALL_FIXTURES = sorted(p.name for p in REF_FIXTURES.glob("*.html"))

# Representative page URL per fixture, matching how the reference serves /
# tests each one (scrapeDocument.test.ts + testdata/local-server.ts routes).
FIXTURE_URLS = {
    "wordpress-pdf-link.html": "https://example.com/download/file/",
    "wordpress-agenda-link.html": "https://example.com/download/agenda/",
    "wordpress-document-link.html": "https://example.com/download/document/",
    "wordpress-meeting-link.html": "https://example.com/download/meeting/",
    "wordpress-html-entities.html": "https://example.com/download/entities/",
    "civicweb-download.html": "https://example.civicweb.net/filepro/documents/?preview=52835",
    "civicweb-html-entities.html": "https://example.civicweb.net/filepro/documents/?preview=60001",
    "civicweb-no-pdf.html": "https://example.civicweb.net/filepro/documents/?preview=70002",
    "civicweb-view.html": "https://example.civicweb.net/filepro/documents/view/80003",
    "docushare-download.html": "https://example.com/docushare/dsweb/Get/Document-12345",
    "docushare-serviceslib.html": "https://example.com/docushare/dsweb/View/Collection-7",
    "docushare-html-entities.html": "https://example.com/docushare/dsweb/Get/Document-555",
    "docushare-xlsx.html": "https://example.com/docushare/dsweb/View/Collection-1",
    "docushare-no-link.html": "https://example.com/docushare/dsweb/View/Collection-9",
    "docushare-generator.html": "https://example.com/documents/archive",
    "normal-page.html": "https://example.com/article",
    "page-with-title.html": "https://example.com/fixtures/page-with-title.html",
}


def ref_fixture(name: str) -> str:
    return (REF_FIXTURES / name).read_text()


def test_all_17_fixtures_present():
    assert len(ALL_FIXTURES) == 17
    assert set(FIXTURE_URLS) == set(ALL_FIXTURES)


# --- hardcoded expectations from scrapeDocument.test.ts:20-94 --------------


def test_wordpress_pdf_link_detection():
    url = "https://example.com/download/file/"
    html = ref_fixture("wordpress-pdf-link.html")
    assert (
        extract_wordpress_download_url(url, html)
        == "https://example.com/download/file.pdf?wpdmdl=12345&refresh=abc123"
    )
    assert detect_document_url(url, html) == {
        "url": "https://example.com/download/file.pdf?wpdmdl=12345&refresh=abc123",
        "type": "application/pdf",
        "is_pdf": True,
        "strategy": "wordpress-pdf-link",
    }


def test_wordpress_anti_loop_on_wpdmdl_urls():
    url = "https://example.com/download/file/?wpdmdl=12345"
    html = ref_fixture("wordpress-meeting-link.html")
    assert extract_wordpress_download_url(url, html) is None
    assert detect_document_url(url, html) is None


def test_civicweb_preview_detection_percent20_escaping():
    url = "https://example.civicweb.net/filepro/documents/?preview=52835"
    html = ref_fixture("civicweb-download.html")
    expected = (
        "https://example.civicweb.net/filepro/document/52835/"
        "Regular%20Board%20-%2016%20Oct%202025%20-%20Agenda%20-%20Pdf.pdf"
    )
    assert extract_civicweb_document_url(url, html) == expected
    assert detect_document_url(url, html) == {
        "url": expected,
        "type": "application/pdf",
        "is_pdf": True,
        "strategy": "civicweb-pdf-link",
    }


def test_docushare_detection():
    url = "https://example.com/docushare/dsweb/Get/Document-12345"
    html = ref_fixture("docushare-download.html")
    expected = "https://example.com/dsweb/Get/Document-12345/Council%20Minutes%20-%20Oct%202025.pdf"
    assert extract_docushare_document_url(url, html) == expected
    assert detect_document_url(url, html) == {
        "url": expected,
        "type": "application/pdf",
        "is_pdf": True,
        "strategy": "docushare-doc-link",
    }


def test_docushare_non_pdf_xlsx():
    url = "https://example.com/docushare/dsweb/View/Collection-1"
    html = ref_fixture("docushare-xlsx.html")
    assert detect_document_url(url, html) == {
        "url": "https://example.com/dsweb/Get/Document-999/Spreadsheet.xlsx",
        "type": "application/octet-stream",
        "is_pdf": False,
        "strategy": "docushare-doc-link",
    }


def test_normal_page_detects_nothing():
    assert detect_document_url("https://example.com/article", ref_fixture("normal-page.html")) is None


# --- coordinator expectations (scrapeDocument.test.ts:107-156) -------------


def test_page_with_title_metadata_and_text():
    html = ref_fixture("page-with-title.html")
    meta = extract_html_metadata(html)
    assert meta["title"] == "Test Page Title"
    assert meta["description"] == "Test page description"
    assert "Content here" in strip_html_to_text(html)
    assert "<title>Test Page Title</title>" in html


def test_wpdmdl_url_returning_html_is_not_redetected():
    """wordpress-detection.spec.ts:42-54: a wpdmdl URL that serves HTML must
    NOT loop back into the WordPress detector."""
    url = "https://example.com/fixtures/wordpress-meeting-link.html?wpdmdl=17656"
    html = ref_fixture("wordpress-meeting-link.html")
    assert detect_document_url(url, html) is None


def test_download_url_normalization_trailing_slash():
    """wordpress-detection.spec.ts:56-81: /download/file and /download/file/
    behave identically after normalization."""
    assert normalize_download_page_url("https://example.com/download/file") == (
        "https://example.com/download/file/"
    )
    assert normalize_download_page_url("https://example.com/download/file/") == (
        "https://example.com/download/file/"
    )
    html = ref_fixture("wordpress-pdf-link.html")
    with_slash = detect_document_url(
        normalize_download_page_url("https://example.com/download/file"), html
    )
    without = detect_document_url(
        normalize_download_page_url("https://example.com/download/file/"), html
    )
    assert with_slash == without
    assert with_slash["strategy"] == "wordpress-pdf-link"
    assert with_slash["is_pdf"] is True


# --- links.test.ts:11-46 hardcoded ----------------------------------------


def test_resolve_href_reference_cases():
    assert resolve_href("/docs", "https://example.com/base/") == "https://example.com/docs"
    assert resolve_href("http://[invalid", "not-a-base-url") == "http://[invalid"


def test_extract_html_links_reference_case():
    links = extract_html_links(
        """
        <a href="/docs" title="Docs" aria-label="Docs link" rel="nofollow" target="_blank" class="primary  docs">Docs</a>
        <a href="/docs">Duplicate</a>
        <a href="/plain">Plain</a>
        """,
        "https://example.com/base/",
    )
    assert links == [
        Link(
            href="https://example.com/docs",
            text="Docs",
            title="Docs",
            aria_label="Docs link",
            rel="nofollow",
            target="_blank",
            classes=["primary", "docs"],
        ),
        Link(
            href="https://example.com/plain",
            text="Plain",
            title=None,
            aria_label=None,
            rel=None,
            target=None,
            classes=None,
        ),
    ]


# --- full-chain differential: all 17 fixtures vs the Node oracle ----------


@pytest.mark.skipif(not HAS_NODE, reason="node not available")
def test_detector_chain_matches_js_on_all_17_fixtures():
    args = [[FIXTURE_URLS[name], ref_fixture(name)] for name in ALL_FIXTURES]
    expected = js_oracle("detect", args)
    for name, (url, html), exp in zip(ALL_FIXTURES, args, expected):
        got = detect_document_url(url, html)
        assert got == exp, f"detector divergence on {name}: {got!r} != {exp!r}"


@pytest.mark.skipif(not HAS_NODE, reason="node not available")
def test_strip_and_meta_match_js_on_all_17_fixtures():
    htmls = [ref_fixture(n) for n in ALL_FIXTURES]
    exp_strip = js_oracle("strip", htmls)
    exp_meta = js_oracle("meta", htmls)
    for name, html, s, m in zip(ALL_FIXTURES, htmls, exp_strip, exp_meta):
        assert strip_html_to_text(html) == s, f"strip divergence on {name}"
        meta = extract_html_metadata(html)
        assert [meta["title"], meta["description"]] == m, f"meta divergence on {name}"


@pytest.mark.skipif(not HAS_NODE, reason="node not available")
def test_anti_loop_guard_differential_on_wpdm_fixtures():
    """Every WPDM fixture re-served under a wpdmdl= URL must be null in both
    engines (the issue-sdk#440 cycle guard)."""
    wpdm = [n for n in ALL_FIXTURES if n.startswith("wordpress-")]
    args = [[FIXTURE_URLS[n] + "?wpdmdl=999", ref_fixture(n)] for n in wpdm]
    expected = js_oracle("detect", args)
    for name, (url, html), exp in zip(wpdm, args, expected):
        got = detect_document_url(url, html)
        assert got == exp, f"anti-loop divergence on {name}"
        assert got is None or got["strategy"] != "wordpress-pdf-link"
