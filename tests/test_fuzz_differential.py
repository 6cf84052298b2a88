"""Randomized differential fuzzing of the byte-identical surface against
real JS (Node oracle) + property-based invariants.

The generators are seeded (random.Random(42)) so the corpus is identical on
every run; Node comparisons are batched into one subprocess call each."""

from __future__ import annotations

import random

import pytest

from spider_spark import textops, urlops
from tests.conftest import HAS_NODE, js_oracle

pytestmark = pytest.mark.skipif(not HAS_NODE, reason="node oracle unavailable")

_SCHEMES = ["http://", "https://", "ftp://", "", "//", "HTTPS://"]
_HOSTS = ["a.test", "WWW.Example.COM", "xn--nxasmq6b.test", "127.0.0.1", "a.test:8080", "a.test:80"]
_PATH_BITS = ["", "/", "/a", "/a/b", "/a/../b", "/./x", "/a%20b", "/a b", "/ä", "/..", "/...", "//x", "\\x", "/a\\b"]
_TAILS = ["", "?q=1", "?a=b&c=d", "#frag", "?q=1#f", "?", "#", "?a=%zz"]
_REL = ["x", "./x", "../x", "../../x", "?q=2", "#only", "", ".", "..", "//other.test/p", "\\server\\p",
        "x/y/../z", "a b", "%7Euser", "mailto:a@b", "javascript:void(0)", "data:,x", "HTTP://UP.test/P",
        "x\ty", "a\nb", "\r./z", " lead", "trail ", "x%", "%4a", "%4A", "~u", "|pipe", "<angle>",
        "..%2F..", "a?b?c", "a#b#c", ":8080/x", "http:pathonly", "https:../up"]


def _rand_abs(rng: random.Random) -> str:
    return rng.choice(_SCHEMES) + rng.choice(_HOSTS) + rng.choice(_PATH_BITS) + rng.choice(_TAILS)


def test_resolve_fuzz_matches_node_url():
    rng = random.Random(42)
    cases = []
    for _ in range(1500):
        base = "https://" + rng.choice(_HOSTS) + rng.choice(_PATH_BITS) + rng.choice(_TAILS)
        href = rng.choice([_rand_abs(rng), rng.choice(_REL), rng.choice(_REL) + rng.choice(_TAILS)])
        cases.append([href, base])
    expected = js_oracle("resolve", cases)
    for (href, base), exp in zip(cases, expected):
        try:
            got = urlops.whatwg_resolve(href, base)
        except (urlops.URLParseError, ValueError):
            got = None
        assert got == exp, f"resolve({href!r}, {base!r}): py={got!r} js={exp!r}"


def test_strip_html_fuzz_matches_node():
    rng = random.Random(43)
    bits = [
        "<p>", "</p>", "text ", "<script>var x = '<b>';</script>", "<style>a{color:red}</style>",
        "<ScRiPt >x</sCrIpT>", "&amp;", " ", "　", "\t\n", "<scriptish>k</scriptish>",
        "< notag", ">", "<a href='x'>l</a>", "﻿", "word", "<br/>", "<!-- c -->", "  ",
        "<script>no close", "<style>a{}</style", "  ",
    ]
    cases = ["".join(rng.choice(bits) for _ in range(rng.randint(1, 16))) for _ in range(300)]
    expected = js_oracle("strip", cases)
    for html, exp in zip(cases, expected):
        assert textops.strip_html_to_text(html) == exp, f"strip({html!r})"


def test_entities_fuzz_matches_node():
    rng = random.Random(44)
    bits = ["&amp;", "&quot;", "&#039;", "&lt;", "&gt;", "&amp;quot;", "&amp;amp;", "x", "&", ";", "&nbsp;", "&#39;"]
    cases = ["".join(rng.choice(bits) for _ in range(rng.randint(1, 10))) for _ in range(200)]
    expected = js_oracle("entities", cases)
    for v, exp in zip(cases, expected):
        assert textops.decode_html_entities(v) == exp


def test_meta_fuzz_matches_node():
    rng = random.Random(45)
    bits = [
        "<title>T1</title>", "<title >T2</title>", "<TITLE>T3</TITLE>", "<title></title>",
        '<meta name="description" content="D1">', "<meta name='description' content='D2'>",
        '<meta content="D3" name="description">', "<title>a<b</title>", "txt",
        '<meta name="description" content="">',
    ]
    cases = ["".join(rng.choice(bits) for _ in range(rng.randint(1, 6))) for _ in range(200)]
    expected = js_oracle("meta", cases)
    for html, (t, d) in zip(cases, expected):
        meta = textops.extract_html_metadata(html)
        assert meta["title"] == t and meta["description"] == d, html


def test_canonicalize_idempotent_on_fuzz():
    """canonicalize(canonicalize(u)) == canonicalize(u) — the frontier key
    must be a fixed point or dedupe breaks."""
    rng = random.Random(46)
    n = ok = 0
    for _ in range(500):
        u = _rand_abs(rng)
        c = urlops.canonicalize_url(u)
        if c is None:
            continue
        n += 1
        assert urlops.canonicalize_url(c) == c, u
        ok += 1
    assert n > 100  # the generator produces plenty of valid URLs


def test_cache_key_matches_js_reference_semantics():
    """create_cache_key vs the Node oracle's verbatim createCacheKey
    (double-encoded parts, sorted keys, JSON escaping) — byte-identical."""
    from spider_spark import textops

    cases = [
        ["simple", "http://h/x", []],
        ["simple", "http://h/x", [textops.default_headers()]],
        ["dom", 'http://h/pa"th?q=\\back', []],
        ["crawlee", "http://h/x", [True, None, {"b": [1, 2], "a": "s"}, 0.5]],
        ["tree", "http://h/x", [10, 100, 1000, [".sel  a", "details summary"], False]],
        ["c", "http://h/x", [{"nested": {"z": None, "a": ["q\"uote", "back\\slash"]}}]],
    ]
    expected = js_oracle("cache_key", cases)
    for (ns, url, parts), exp in zip(cases, expected):
        assert textops.create_cache_key(ns, url, parts) == exp, (ns, url, parts)


def test_cache_key_locale_compare_key_ordering():
    """cache.ts:92-94 sorts object keys with localeCompare (ICU: 'accept'
    < 'DNT', 'a' < 'A'), NOT codepoint order — mixed-case header dicts
    must serialize in the same byte order as Node."""
    from spider_spark import textops

    cases = [
        ["simple", "http://h/x", [{"DNT": "1", "accept": "x"}]],
        ["simple", "http://h/x", [{"a": 1, "A": 2, "b": 3, "B": 4}]],
        ["simple", "http://h/x", [textops.default_headers(None, {"x-custom": "1", "Authorization": "t"})]],
        ["simple", "http://h/x", [{"Upgrade-Insecure-Requests": "1", "user-agent": "u", "User-Agent2": "v"}]],
    ]
    expected = js_oracle("cache_key", cases)
    for (ns, url, parts), exp in zip(cases, expected):
        assert textops.create_cache_key(ns, url, parts) == exp, parts


def test_stable_stringify_fuzz_vs_node(  ):
    """Seeded random nested structures through create_cache_key vs Node's
    verbatim createCacheKey — locks the whole stableStringify recursion
    (key collation, double-encoding, null/bool/number formatting)."""
    import random

    from spider_spark import textops

    rng = random.Random(20260817)
    keys = ["a", "A", "b2", "DNT", "accept", "Accept", "user-agent", "X", "zz", "_k"]

    def rand_value(depth=0):
        r = rng.random()
        if depth > 2 or r < 0.25:
            return rng.choice([None, True, False, 0, 7, 0.5, -3, "s", 'q"uo', "back\\sl", ""])
        if r < 0.55:
            return [rand_value(depth + 1) for _ in range(rng.randrange(0, 4))]
        return {rng.choice(keys): rand_value(depth + 1) for _ in range(rng.randrange(0, 5))}

    cases = [["ns", f"http://h/{i}", [rand_value() for _ in range(rng.randrange(0, 3))]] for i in range(60)]
    expected = js_oracle("cache_key", cases)
    for (ns, url, parts), exp in zip(cases, expected):
        assert textops.create_cache_key(ns, url, parts) == exp, parts
