"""WHATWG normalization for the DomAdapter (spider_spark/domnorm.py) —
the happy-dom processHtml contract (dom.ts:36-49).

Three layers of evidence, strongest available first:

1. TRUE differential vs happy-dom through tests/js_oracle.mjs's
   ``normalize`` op — byte parity on the 17 reference fixtures plus the
   structural cases. happy-dom cannot be installed in this sandbox (no
   network), so the differential reports unavailable and these skip with
   that reason; they activate unchanged wherever the library resolves.
2. Spec-derived vendored expectations: outputs hand-computed from the
   WHATWG fragment parse (§13.4, context <html>) + fragment serialization
   (§13.3) algorithms that happy-dom 20 implements.
3. Invariants every spec serializer guarantees: idempotence, head/body
   wrapping, balanced markup, attribute quoting.
"""

from __future__ import annotations

import pathlib

import pytest

from spider_spark import textops
from spider_spark.domnorm import whatwg_normalize_html
from tests.conftest import HAS_NODE, js_oracle

FIXTURES = sorted(
    pathlib.Path(__file__).parent.joinpath("fixtures/reference").glob("*.html")
)


# --- layer 2: spec-derived expectations ------------------------------------

SPEC_CASES = [
    # head/body synthesis around bare content (§13.4 context html resets
    # to "before head"; anything-else tokens open head then body)
    ("<p>hi</p>", "<html><head></head><body><p>hi</p></body></html>"),
    # head content routed into head; body attrs kept; implied </p>
    (
        '<html><head><title>T &amp; t</title></head><body class="x"><p>a<p>b</body></html>',
        '<html><head><title>T &amp; t</title></head>'
        '<body class="x"><p>a</p><p>b</p></body></html>',
    ),
    # li auto-closure (§13.2.6.4.7 "li" start tag)
    ("<ul><li>a<li>b</ul>", "<html><head></head><body><ul><li>a</li><li>b</li></ul></body></html>"),
    # dt/dd mutual closure
    (
        "<dl><dt>a<dd>b<dt>c<dd>d</dl>",
        "<html><head></head><body><dl><dt>a</dt><dd>b</dd><dt>c</dt><dd>d</dd></dl></body></html>",
    ),
    # stray </p> materializes an empty p (§13.2.6.4.7 end tag "p")
    ("<div>x</p></div>", "<html><head></head><body><div>x<p></p></div></body></html>"),
    # </br> acts as <br>
    ("a</br>b", "<html><head></head><body>a<br>b</body></html>"),
    # attribute normalization: double quotes, minimal escaping (§13.3:
    # attribute mode escapes & " nbsp), entity decode+re-encode
    ("<a href='q\"r'>l</a>", '<html><head></head><body><a href="q&quot;r">l</a></body></html>'),
    # boolean attribute serialized as name=""
    ("<input disabled>", '<html><head></head><body><input disabled=""></body></html>'),
    # text mode escapes & < > only; numeric refs decode to literals
    (
        "<img src=x.png><br/>text &lt;tag&gt; &#039;q&#039;",
        '<html><head></head><body><img src="x.png"><br>text &lt;tag&gt; \'q\'</body></html>',
    ),
    # DOCTYPE dropped (ignored in fragment parsing), comment kept,
    # script children raw (§13.3 literal text elements)
    (
        "<!DOCTYPE html><html lang=en><body><!-- c --><script>if (a<b) x();</script></body></html>",
        "<html><head></head><body><!-- c --><script>if (a<b) x();</script></body></html>",
    ),
    # rows/cells auto-close in table scope
    (
        "<table><tr><td>1<td>2<tr><td>3</table>",
        "<html><head></head><body><table><tr><td>1</td><td>2</td></tr>"
        "<tr><td>3</td></tr></table></body></html>",
    ),
    # thead closed by tbody
    (
        "<table><thead><tr><th>h</thead><tbody><tr><td>1</table>",
        "<html><head></head><body><table><thead><tr><th>h</th></tr></thead>"
        "<tbody><tr><td>1</td></tr></tbody></table></body></html>",
    ),
    # heading closes an open heading
    ("<h1>x<h2>y", "<html><head></head><body><h1>x</h1><h2>y</h2></body></html>"),
    # option auto-closure
    (
        "<select><option>a<option>b</select>",
        "<html><head></head><body><select><option>a</option><option>b</option></select></body></html>",
    ),
    # RCDATA title: markup inside stays text, entities decode then re-encode
    (
        "<title>A &amp; <b>B</title>",
        "<html><head><title>A &amp; &lt;b&gt;B</title></head><body></body></html>",
    ),
    # bogus comment from a processing instruction (tokenizer §13.2.5.42)
    (
        "<?php echo 1 ?><p>x",
        "<html><!--?php echo 1 ?--><head></head><body><p>x</p></body></html>",
    ),
    # nbsp escaped in both text and attribute modes
    (
        '<p title="a b">c d</p>',
        '<html><head></head><body><p title="a&nbsp;b">c&nbsp;d</p></body></html>',
    ),
    # duplicate attribute: first wins (tokenizer duplicate-attribute rule)
    ('<a href="1" href="2">x</a>', '<html><head></head><body><a href="1">x</a></body></html>'),
]


@pytest.mark.parametrize("raw,want", SPEC_CASES, ids=range(len(SPEC_CASES)))
def test_spec_derived_bytes(raw, want):
    assert whatwg_normalize_html(raw) == want


# --- layer 3: invariants ----------------------------------------------------


def test_idempotent_on_fixtures():
    for p in FIXTURES:
        h = p.read_text(errors="replace")
        once = textops.normalize_html(h)
        assert textops.normalize_html(once) == once, p.name
        assert once.startswith("<html>") and once.endswith("</html>"), p.name


def test_normalize_never_raises_on_garbage():
    for junk in ["", "<", "<<<>>>", "<a b=", "\x00<p>\x00", "<p" * 1000, "a&#x;b"]:
        out = textops.normalize_html(junk)
        assert isinstance(out, str)
        # the contract: either normalized output or the raw input (dom.ts:43-48)
        assert out == textops.normalize_html(out) or out == junk


def test_text_extraction_parity_with_reference_path():
    """The DomAdapter strips text from the NORMALIZED html (dom.ts:126 →
    scrapeDocument). Entity decoding at parse time means dom-path text can
    legitimately differ from simple-path text on entity-bearing pages (in
    the reference too — happy-dom decodes the same way); on entity-free
    pages the two paths must agree exactly."""
    for p in FIXTURES:
        h = p.read_text(errors="replace")
        if "&" in h:
            continue  # entity-bearing: paths legitimately diverge
        assert textops.strip_html_to_text(
            textops.normalize_html(h)
        ) == textops.strip_html_to_text(h), p.name


# --- layer 1: the true happy-dom differential ------------------------------


def _normalize_oracle(cases):
    out = js_oracle("normalize", cases)
    if out and isinstance(out[0], dict) and "unavailable" in out[0]:
        pytest.skip(
            "happy-dom not installed in this sandbox (no network; installs "
            "forbidden) — differential activates where it resolves: "
            + out[0]["unavailable"]
        )
    return out


@pytest.mark.skipif(not HAS_NODE, reason="node unavailable")
def test_happy_dom_byte_parity_fixtures():
    cases = [p.read_text(errors="replace") for p in FIXTURES]
    want = _normalize_oracle(cases)
    for p, h, w in zip(FIXTURES, cases, want):
        assert textops.normalize_html(h) == w, p.name


@pytest.mark.skipif(not HAS_NODE, reason="node unavailable")
def test_happy_dom_byte_parity_structural_cases():
    cases = [raw for raw, _ in SPEC_CASES]
    want = _normalize_oracle(cases)
    for (raw, _), w in zip(SPEC_CASES, want):
        assert whatwg_normalize_html(raw) == w, raw
