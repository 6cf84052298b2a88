"""Document-URL detector chain parity (own fixtures, reference semantics).

Mirrors the assertions of the reference's detector suite
(/root/reference/src/scrapeDocument.test.ts:20-94) over this repo's own
fixture pages.
"""

from __future__ import annotations

import pytest

from spider_spark import textops as t
from tests.conftest import HAS_NODE, fixture_text, js_oracle


def test_wpdm_detection_relative_resolved():
    url = "https://docs.acme-town.org/download/budget-2026/"
    html = fixture_text("wpdm_page.html")
    expected = "https://docs.acme-town.org/download/budget-2026.pdf?wpdmdl=777&refresh=zz9"
    assert t.extract_wordpress_download_url(url, html) == expected
    assert t.detect_document_url(url, html) == {
        "url": expected,
        "type": "application/pdf",
        "is_pdf": True,
        "strategy": "wordpress-pdf-link",
    }


def test_wpdm_anti_loop_guard():
    # URL already carrying wpdmdl= must not re-detect (issue sdk#440 /
    # detectors.ts:40-47)
    url = "https://docs.acme-town.org/download/budget-2026/?wpdmdl=777"
    html = fixture_text("wpdm_page.html")
    assert t.extract_wordpress_download_url(url, html) is None
    assert t.detect_document_url(url, html) is None


def test_wpdm_entity_decoding_and_space_encoding():
    url = "https://blog.example.org/download/plan/"
    html = fixture_text("wpdm_entities.html")
    # &amp; decoded BEFORE resolution, space percent-encoded by WHATWG
    expected = "https://blog.example.org/dl/plan.pdf?wpdmdl=88&ver=2&x=a%20b"
    assert t.detect_document_url(url, html)["url"] == expected


def test_wpdm_fallback_to_first_pdf_href():
    url = "https://town.example.org/reports"
    html = fixture_text("wpdm_fallback_pdf.html")
    # wpdm_view_count marker makes it a WPDM page; no wpdmdl link so the
    # first *.pdf href wins, resolved relative to the page URL
    assert t.detect_document_url(url, html) == {
        "url": "https://town.example.org/files/annual%20report.pdf",
        "type": "application/pdf",
        "is_pdf": True,
        "strategy": "wordpress-pdf-link",
    }


def test_civicweb_preview_detection():
    url = "https://meet.civicweb.net/filepro/documents/?preview=4242"
    html = fixture_text("civicweb_preview.html")
    expected = (
        "https://meet.civicweb.net/filepro/document/4242/"
        "Special%20Meeting%20-%203%20Mar%202026%20-%20Minutes%20-%20Pdf.pdf"
    )
    assert t.extract_civicweb_document_url(url, html) == expected
    assert t.detect_document_url(url, html)["strategy"] == "civicweb-pdf-link"


def test_civicweb_none_when_no_doc_link():
    url = "https://meet.civicweb.net/filepro/documents/?preview=9"
    assert t.detect_document_url(url, fixture_text("civicweb_none.html")) is None


def test_docushare_get_pattern():
    url = "https://portal.example.com/docushare/dsweb/Get/Document-5150"
    html = fixture_text("docushare_get.html")
    assert t.detect_document_url(url, html) == {
        "url": "https://portal.example.com/dsweb/Get/Document-5150/Harbor%20Commission%20Minutes%20-%20Jan%202026.pdf",
        "type": "application/pdf",
        "is_pdf": True,
        "strategy": "docushare-doc-link",
    }


def test_docushare_serviceslib_and_octet_stream():
    url = "https://portal.example.com/intranet"
    html = fixture_text("docushare_services.html")  # page mentions DocuShare
    res = t.detect_document_url(url, html)
    assert res["url"].endswith("/dsweb/ServicesLib/Document-31337/Zoning%20Map%20Update.docx")
    assert res["type"] == "application/octet-stream" and res["is_pdf"] is False


def test_docushare_xlsx_detected_via_html_marker():
    url = "https://portal.example.com/docushare/dsweb/View/Collection-1"
    html = fixture_text("docushare_xlsx.html")
    res = t.detect_document_url(url, html)
    assert res == {
        "url": "https://portal.example.com/dsweb/Get/Document-2048/Capital%20Plan.xlsx",
        "type": "application/octet-stream",
        "is_pdf": False,
        "strategy": "docushare-doc-link",
    }


def test_ordinary_page_detects_nothing():
    assert t.detect_document_url("https://example.com/article", fixture_text("normal_article.html")) is None


def test_detector_order_wpdm_before_civicweb():
    # a page matching both WPDM and CivicWeb rules resolves as WPDM
    # (first-match-wins chain order, detectors.ts:142-179)
    url = "https://x.civicweb.net/filepro/documents/?preview=1"
    html = (
        '<a href="/filepro/document/1/A.pdf">c</a>'
        '<a href="/get?wpdmdl=5">w</a><span class="wpdm_view_count">1</span>'
    )
    assert t.detect_document_url(url, html)["strategy"] == "wordpress-pdf-link"


@pytest.mark.skipif(not HAS_NODE, reason="node not available")
def test_detector_regexes_node_differential():
    cases = [
        ["https://h/", fixture_text(n)]
        for n in [
            "wpdm_page.html", "wpdm_entities.html", "wpdm_fallback_pdf.html",
            "civicweb_preview.html", "civicweb_none.html", "docushare_get.html",
            "docushare_services.html", "docushare_xlsx.html", "normal_article.html",
        ]
    ]
    cases.append(["https://h/", 'href="/a.pdf" HREF=\'/b.PDF?x=1\' href="/c?wpdmdl=9&y"'])
    expected = js_oracle("detect_regexes", cases)
    for (url, html), (wpdm, pdf, civic, ds_get, ds_lib) in zip(cases, expected):
        m = t._WPDM_LINK_RE.search(html)
        assert (m.group(1) if m else None) == wpdm
        m = t._PDF_LINK_RE.search(html)
        assert (m.group(1) if m else None) == pdf
        m = t._CIVICWEB_RE.search(html)
        assert (m.group(1) if m else None) == civic
        m = t._DOCUSHARE_RES[0].search(html)
        assert (m.group(1) if m else None) == ds_get
        m = t._DOCUSHARE_RES[1].search(html)
        assert (m.group(1) if m else None) == ds_lib
