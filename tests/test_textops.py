"""Byte-identical parity tests for the scalar extraction core."""

from __future__ import annotations

import random

import pytest

from spider_spark import textops as t
from tests.conftest import HAS_NODE, fixture_text, js_oracle


def test_strip_html_to_text_basic():
    html = fixture_text("normal_article.html")
    out = t.strip_html_to_text(html)
    assert out == "Harbor Notes Harbor Notes Content here about the pier rebuild."
    # script/style content gone, incl. tag-like strings inside script
    assert "tracker" not in out and "color" not in out


def test_strip_handles_js_whitespace_set():
    # U+FEFF is JS whitespace (trimmed/collapsed); Python \s would miss it.
    assert t.strip_html_to_text("﻿<p>a  b</p>﻿") == "a b"
    # \x1c is Python-\s but NOT JS whitespace — must survive
    assert t.strip_html_to_text("<p>a\x1cb</p>") == "a\x1cb"


def test_extract_html_metadata():
    html = fixture_text("normal_article.html")
    meta = t.extract_html_metadata(html)
    assert meta == {"title": "Harbor Notes", "description": "Weekly harbor district notes"}
    assert t.extract_html_metadata("<p>no title</p>") == {"title": None, "description": None}
    # [^<]+ means an empty or tag-containing title does not match
    assert t.extract_html_metadata("<title></title>")["title"] is None


def test_decode_html_entities_exact_five():
    assert t.decode_html_entities("&amp; &quot; &#039; &lt; &gt;") == "& \" ' < >"
    # sequential replaces chain: &amp;quot; → &quot; → "
    assert t.decode_html_entities("&amp;quot;x") == '"x'
    # anything else untouched (NOT a general unescape)
    assert t.decode_html_entities("&nbsp;&#x27;") == "&nbsp;&#x27;"


def test_normalize_download_page_url():
    f = t.normalize_download_page_url
    assert f("https://h.com/download/budget-2026") == "https://h.com/download/budget-2026/"
    assert f("https://h.com/download/file.pdf") == "https://h.com/download/file.pdf"
    assert f("https://h.com/download/x?a=1") == "https://h.com/download/x?a=1"
    assert f("https://h.com/download/x/") == "https://h.com/download/x/"
    assert f("https://h.com/other/page") == "https://h.com/other/page"
    # unparseable URL falls back to the split-on-? heuristic
    assert f("not a url/download/thing") == "not a url/download/thing/"


def test_infer_content_type_and_pdf():
    assert t.infer_content_type("A.PDF") == "application/pdf"
    assert t.infer_content_type("x.tar.gz") == "application/gzip"
    assert t.infer_content_type("noext") == "application/octet-stream"
    assert t.infer_content_type(None) == "application/octet-stream"
    assert t.infer_content_type("weird.xyz") == "application/octet-stream"
    assert t.is_pdf_file("DOC.pdf") is True
    assert t.is_pdf_file("doc.pdfx") is False
    assert t.is_pdf_file(None) is False


def test_is_pdf_page():
    assert t.is_pdf_page("http://h/x.PDF", "")
    assert t.is_pdf_page("http://h/x", "... application/pdf ...")
    assert t.is_pdf_page("http://h/x", "%PDF-1.4 binary")
    assert not t.is_pdf_page("http://h/x", "<html>")


def test_cache_key_stability():
    k1 = t.create_cache_key("simple", "http://h/x", [{"b": 1, "a": 2}])
    k2 = t.create_cache_key("simple", "http://h/x", [{"a": 2, "b": 1}])
    assert k1 == k2 and k1.startswith("simple:") and len(k1.split(":")[1]) == 64
    k3 = t.create_cache_key("simple", "http://h/x", [{"a": 2, "b": 1, "c": t.UNDEFINED}])
    assert k3 == k1  # undefined values dropped (cache.ts:91)
    k4 = t.create_cache_key("simple", "http://h/x", [{"a": 2, "b": 1, "c": None}])
    assert k4 != k1  # null is KEPT (only undefined drops)
    assert t.create_cache_key("dom", "http://h/x") != k1  # namespace in key


def test_stable_stringify_double_encoding():
    """normalizeCacheKeyPart double-encodes each part: the part object is
    stringified to a STRING, which the outer stringify JSON-quotes."""
    sig = t.stable_stringify(
        {"parts": [p for p in map(t.normalize_cache_key_part, [{"a": 1}]) if p is not None],
         "url": "http://h/x"}
    )
    assert sig == '{"parts":["{\\"a\\":1}"],"url":"http://h/x"}'
    assert t.stable_stringify(True) == "true"
    assert t.stable_stringify(None) == "null"
    assert t.stable_stringify(t.UNDEFINED) == "undefined"
    assert t.stable_stringify(["x", 1, None]) == '["x",1,null]'


def test_adapter_cache_keys_vary_with_config():
    """index.spec.ts:206-237 / scrapers.spec.ts:220-266: config knobs fold
    into the key, so different headers / selectors fetch separately."""
    base = t.adapter_cache_key("simple", "http://h/x")
    hdr = t.adapter_cache_key("simple", "http://h/x", {"headers": {"X-Custom": "1"}})
    assert base != hdr
    # same headers ⇒ same key (read-through hit)
    assert hdr == t.adapter_cache_key("simple", "http://h/x", {"headers": {"X-Custom": "1"}})
    # adapters never collide on the same url
    keys = {t.adapter_cache_key(a, "http://h/x") for a in ("simple", "dom", "crawlee", "crawl4ai", "tree")}
    assert len(keys) == 5
    # tree expansion knobs vary the key (customSelectors case)
    t1 = t.adapter_cache_key("tree", "http://h/x", {"customSelectors": [".x"]})
    t2 = t.adapter_cache_key("tree", "http://h/x", {"customSelectors": [".y"]})
    assert t1 != t2


def _random_html(rng: random.Random) -> str:
    bits = [
        "<p>word</p>", "text &amp; more", "<script>var a = '<div>';</script>",
        "<SCRIPT src=x>1<2</script>", "<style>.a{content:'</ '}</style>",
        "<b>bold</b>", " ", "﻿", "\t\n", "plain < notatag",
        "<div class='x'>nested <span>deep</span></div>", "a  b", "&lt;tag&gt;",
        "<scripty>not a script tag</scripty>", "<br/>", "<!-- comment -->",
        "<title>T T</title>", '<meta name="description" content="D D">',
    ]
    return "".join(rng.choice(bits) for _ in range(rng.randint(1, 25)))


@pytest.mark.skipif(not HAS_NODE, reason="node not available")
def test_strip_node_differential():
    rng = random.Random(7)
    samples = [_random_html(rng) for _ in range(300)]
    samples += [fixture_text(n) for n in [
        "normal_article.html", "links_page.html", "wpdm_page.html",
        "civicweb_preview.html", "docushare_get.html",
    ]]
    expected = js_oracle("strip", samples)
    for s, exp in zip(samples, expected):
        assert t.strip_html_to_text(s) == exp, repr(s)


@pytest.mark.skipif(not HAS_NODE, reason="node not available")
def test_metadata_node_differential():
    rng = random.Random(8)
    samples = [_random_html(rng) for _ in range(200)]
    expected = js_oracle("meta", samples)
    for s, (title, desc) in zip(samples, expected):
        meta = t.extract_html_metadata(s)
        assert meta["title"] == title and meta["description"] == desc, repr(s)


@pytest.mark.skipif(not HAS_NODE, reason="node not available")
def test_entities_node_differential():
    rng = random.Random(9)
    bits = ["&amp;", "&quot;", "&#039;", "&lt;", "&gt;", "&amp;quot;", "x", "&", ";", "&nbsp;"]
    samples = ["".join(rng.choice(bits) for _ in range(rng.randint(1, 12))) for _ in range(200)]
    expected = js_oracle("entities", samples)
    for s, exp in zip(samples, expected):
        assert t.decode_html_entities(s) == exp, repr(s)


def test_extract_markdown_preference():
    from spider_spark import textops as t
    assert t.extract_markdown("plain md") == "plain md"
    assert t.extract_markdown({"fit_markdown": "fit", "raw_markdown": "raw"}) == "fit"
    assert t.extract_markdown({"raw_markdown": "raw"}) == "raw"
    assert t.extract_markdown({"fit_markdown": "", "raw_markdown": "raw"}) == "raw"
    assert t.extract_markdown({}) is None
    assert t.extract_markdown(None) is None


def test_is_skip_link_heuristic():
    from spider_spark import textops as t
    assert t.is_skip_link("#", "Skip to content")
    assert t.is_skip_link("#", "Main Menu")
    assert t.is_skip_link("#", "x" * 101)
    assert not t.is_skip_link("#", "ok")
    assert not t.is_skip_link("/page", "skip me")  # only href="#" anchors
