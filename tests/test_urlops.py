"""WHATWG URL resolver parity: hardcoded cases + Node differential fuzz."""

from __future__ import annotations

import random

import pytest

from spider_spark.urlops import (
    URLParseError,
    canonicalize_url,
    resolve_href,
    url_host,
    whatwg_resolve,
)
from tests.conftest import HAS_NODE, js_oracle


# Expected values independently verified against Node's `new URL`.
CASES = [
    (("/docs", "https://example.com/base/"), "https://example.com/docs"),
    (("http://[invalid", "not-a-base-url"), None),
    (("../a/./b/../c", "https://example.com/x/y/z"), "https://example.com/x/a/c"),
    (("a b/c?d e#f g", "https://example.com/"), "https://example.com/a%20b/c?d%20e#f%20g"),
    (("//other.com/p", "https://example.com/base"), "https://other.com/p"),
    (("HTTPS://EXAMPLE.COM:443/A/../B", None), "https://example.com/B"),
    (("http://example.com:8080/x", None), "http://example.com:8080/x"),
    (("foo", "https://example.com/a/b?q#f"), "https://example.com/a/foo"),
    (("?q=2", "https://example.com/a/b?q#f"), "https://example.com/a/b?q=2"),
    (("", "https://example.com/a/b?q#f"), "https://example.com/a/b?q"),
    (("http:foo", "http://example.com/bar/baz"), "http://example.com/bar/foo"),
    (("http:foo", "https://example.com/bar/baz"), "http://foo/"),
    (("\\\\example.org\\p", "http://base.com/"), "http://example.org/p"),
    (("/a\\b/c", "http://base.com/"), "http://base.com/a/b/c"),
    (("https://example.com", None), "https://example.com/"),
    (("a/../../../b", "http://h/1/2/3/4"), "http://h/1/b"),
    (
        (
            "/filepro/document/52835/Regular Board - 16 Oct 2025 - Agenda - Pdf.pdf",
            "https://example.civicweb.net/filepro/documents/?preview=52835",
        ),
        "https://example.civicweb.net/filepro/document/52835/Regular%20Board%20-%2016%20Oct%202025%20-%20Agenda%20-%20Pdf.pdf",
    ),
    (("http://0x7f.1/x", None), "http://127.0.0.1/x"),
    (("  http://example.com/a\tb\nc  ", None), "http://example.com/abc"),
    (("http://h/p%2Fq%zz", None), "http://h/p%2Fq%zz"),
    (("mailto:someone@example.com", "https://x.org/"), "mailto:someone@example.com"),
]


@pytest.mark.parametrize("args,expected", CASES)
def test_whatwg_cases(args, expected):
    href, base = args
    if expected is None:
        with pytest.raises((URLParseError, ValueError)):
            whatwg_resolve(href, base)
    else:
        assert whatwg_resolve(href, base) == expected


def test_resolve_href_passthrough_on_invalid():
    # reference: src/shared/links.ts:9-15 — invalid URLs pass through as-is
    assert resolve_href("http://[invalid", "not-a-base-url") == "http://[invalid"
    assert resolve_href("/docs", "https://example.com/base/") == "https://example.com/docs"


def test_url_host_and_canonicalize():
    assert url_host("https://A.Example.COM:443/x") == "a.example.com"
    assert url_host("not a url") is None
    assert canonicalize_url("HTTP://Example.com/a/../b#frag") == "http://example.com/b"
    assert canonicalize_url("mailto:x@y.z") is None
    assert canonicalize_url("javascript:void(0)") is None
    # normalizeDownloadPageUrl folded in (scrapeDocument.ts:129-148)
    assert canonicalize_url("https://h.com/download/budget-2026") == "https://h.com/download/budget-2026/"
    assert canonicalize_url("https://h.com/download/budget.pdf") == "https://h.com/download/budget.pdf"
    assert canonicalize_url("https://h.com/download/x?y=1") == "https://h.com/download/x?y=1"


@pytest.mark.skipif(not HAS_NODE, reason="node not available")
def test_node_differential_fuzz():
    rng = random.Random(4242)
    schemes = ["http:", "https:", "HTTP:", "", "", "", "ftp:", "foo:", "ws:"]
    hosts = ["example.com", "EXAMPLE.com:8080", "a.b", "127.0.0.1", "h", "h:80", "h:443", ""]
    paths = [
        "/a/b", "/a/../b", "a/b", "../x", "./y", "/a b", "/%41", "/a\\b", "\\c",
        "/a//b", "/a/.%2E/b", "/%2e/x", "", "/.", "/..", "a?b", "/end.pdf",
        "/{x}", "/a'b", "/a`{}", "/café/ü", "/../..", "/a/../../..",
    ]
    queries = ["", "?q", "?a=b&c=d", "?sp ace", "?'q'", "?%GG", "?#"]
    frags = ["", "#f", "#a b", "#`x"]
    bases = [
        None,
        "http://base.org/dir/file?bq#bf",
        "https://b.co/",
        "http://u:p@b.co:9/x/y",
        "foo:/nonspecial/path",
    ]
    cases = []
    for _ in range(500):
        href = (
            rng.choice(schemes)
            + (rng.choice(["//", "", "/", ""]) if rng.random() < 0.5 else "")
            + (rng.choice(hosts) if rng.random() < 0.4 else "")
            + rng.choice(paths)
            + rng.choice(queries)
            + rng.choice(frags)
        )
        cases.append([href, rng.choice(bases)])
    expected = js_oracle("resolve", cases)
    mismatches = []
    for (href, base), exp in zip(cases, expected):
        try:
            got = whatwg_resolve(href, base)
        except (URLParseError, ValueError):
            got = None
        if got != exp:
            mismatches.append((href, base, exp, got))
    assert not mismatches, mismatches[:10]
