"""Link extraction + declarative link filter parity."""

from __future__ import annotations

from spider_spark import textops as t
from tests.conftest import fixture_text


BASE = "https://site.example.org/section/index.html"


def _links():
    return t.extract_html_links(fixture_text("links_page.html"), BASE)


def test_extract_links_document_order_and_dedupe():
    links = _links()
    hrefs = [l.href for l in links]
    # keep-first dedupe on absolute href (links.ts:31-35); empty/absent href
    # skipped; '#' resolves to the page URL + fragment
    assert hrefs == [
        "https://site.example.org/docs",
        "https://site.example.org/about",
        "https://site.example.org/section/reports/q1.pdf",
        "https://site.example.org/search?q=a&b=2",
        "https://site.example.org/section/index.html#",
        "https://upper.example.net/Path",
    ]


def test_extract_links_metadata_fields():
    first = _links()[0]
    assert first.text == "Docs"
    assert first.title == "Docs"
    assert first.aria_label == "Docs link"
    assert first.rel == "nofollow"
    assert first.target == "_blank"
    assert first.classes == ["primary", "nav-item"]  # split on \s+, empties dropped
    plain = _links()[1]
    assert plain.text == "About us"  # nested element text concatenated
    assert plain.title is None and plain.classes is None


def test_split_classes():
    assert t.split_classes("a  b\tc") == ["a", "b", "c"]
    assert t.split_classes("   ") is None
    assert t.split_classes(None) is None
    assert t.split_classes("") is None


def test_entity_decoding_in_href_attribute():
    # cheerio/parse5 decode &amp; in attribute values before resolution
    links = t.extract_html_links('<a href="/p?a=1&amp;b=2">x</a>', "https://h/")
    assert links[0].href == "https://h/p?a=1&b=2"


def test_links_inside_script_not_extracted():
    html = '<script>document.write(\'<a href="/fake">x</a>\')</script><a href="/real">r</a>'
    links = t.extract_html_links(html, "https://h/")
    assert [l.href for l in links] == ["https://h/real"]


def test_filter_links_include_union_and_excludes():
    links = [
        t.Link(href="https://h/minutes/2026", text="Meeting minutes"),
        t.Link(href="https://h/agenda/2026", text="Agenda"),
        t.Link(href="https://h/about", text="About"),
        t.Link(href="https://h/minutes/draft", text="Draft minutes"),
    ]
    out = t.filter_links(links, {"urlContains": ["minutes"], "textContains": ["agenda"]})
    assert [l.href for l in out] == [
        "https://h/minutes/2026",
        "https://h/agenda/2026",
        "https://h/minutes/draft",
    ]
    out = t.filter_links(
        links, {"urlContains": ["minutes"], "textContains": ["agenda"], "excludes": ["draft"]}
    )
    assert [l.href for l in out] == ["https://h/minutes/2026", "https://h/agenda/2026"]


def test_filter_links_case_insensitive_match_original_case_dedupe():
    links = [
        t.Link(href="https://h/Jobs/A", text="x"),
        t.Link(href="https://h/jobs/a", text="y"),
        t.Link(href="https://h/Jobs/A", text="z"),
    ]
    out = t.filter_links(links, {"urlContains": ["JOBS"]})
    # case-insensitive matching, but dedupe keyed on original-case href
    assert [l.href for l in out] == ["https://h/Jobs/A", "https://h/jobs/a"]


def test_filter_links_dedupe_false():
    links = [t.Link(href="https://h/a", text="1"), t.Link(href="https://h/a", text="2")]
    assert len(t.filter_links(links, {"dedupe": False})) == 2
    assert len(t.filter_links(links)) == 1


def test_find_document_links():
    links = [
        t.Link(href="https://h/a.PDF"),
        t.Link(href="https://h/b.docx"),
        t.Link(href="https://h/c.html"),
        t.Link(href="https://h/a.PDF"),
    ]
    assert t.find_document_links_from(links) == ["https://h/a.PDF", "https://h/b.docx"]
    assert t.find_document_links_from(links, [".html"]) == ["https://h/c.html"]
