"""Main-content extraction (operators/content.py) and the WET connector."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spider_spark import warc
from spider_spark.operators import content


PAGE = """<html><head><title>Ignore me</title><style>p{color:red}</style>
<script>var words = "many words in script must not leak";</script></head>
<body><nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
<p>This is the first real content paragraph with plenty of words in it.</p>
<p>Tiny follow up.</p>
<div>Another long and substantive paragraph of body content lives right here today.</div>
<footer><a href="/p">Privacy</a> <a href="/t">Terms</a></footer>
<!-- hidden comment with words words words words words words -->
</body></html>"""


def _pages(spark, rows):
    return spark.createDataFrame(rows, ["url", "html"])


def test_boilerplate_dropped_content_kept(spark):
    out = content.extract_main_content(_pages(spark, [("u", PAGE)])).collect()[0]
    assert out.n_blocks == 5  # nav, p, p, div, footer (head/script/comment gone)
    assert out.n_good == 3  # two long paragraphs + the promoted short one
    assert "Home About Contact" not in out.main_text
    assert "Privacy" not in out.main_text
    assert "script" not in out.main_text and "hidden comment" not in out.main_text
    assert out.main_text.split("\n") == [
        "This is the first real content paragraph with plenty of words in it.",
        "Tiny follow up.",
        "Another long and substantive paragraph of body content lives right here today.",
    ]


def test_short_block_not_promoted_without_good_neighbor(spark):
    html = (
        "<html><body><nav><a href=x>A</a> <a href=y>B</a> <a href=z>C</a></nav>"
        "<p>Tiny follow up.</p>"
        "<footer><a href=p>P</a> <a href=q>Q</a></footer></body></html>"
    )
    out = content.extract_main_content(_pages(spark, [("u", html)])).collect()[0]
    assert out.n_good == 0 and out.main_text == ""


def test_link_heavy_block_never_rescued(spark):
    # a link list between two good paragraphs stays boilerplate (bad class
    # is excluded from promotion regardless of neighbors)
    html = (
        "<html><body>"
        "<p>One genuinely long paragraph of real body content sits here first.</p>"
        "<ul><li><a href=1>First related article teaser</a></li></ul>"
        "<p>Another genuinely long paragraph of real body content closes the page.</p>"
        "</body></html>"
    )
    out = content.extract_main_content(_pages(spark, [("u", html)])).collect()[0]
    assert out.n_good == 2
    assert "teaser" not in out.main_text


def test_entities_decoded_in_block_text(spark):
    html = "<html><body><p>Fish &amp; chips &quot;today&quot; are &lt;great&gt; here friends</p></body></html>"
    out = content.extract_main_content(_pages(spark, [("u", html)])).collect()[0]
    assert out.main_text == 'Fish & chips "today" are <great> here friends'


def test_all_boilerplate_page_still_emits_row(spark):
    html = "<html><body><nav><a href=x>Home</a> <a href=y>More</a> <a href=y>Nav</a></nav></body></html>"
    out = content.extract_main_content(_pages(spark, [("u", html)])).collect()
    assert len(out) == 1 and out[0].main_text == "" and out[0].n_good == 0


def test_page_blocks_link_density(spark):
    html = '<html><body><p>four plain words <a href="/x">and a link</a></p></body></html>'
    b = content.page_blocks(_pages(spark, [("u", html)])).collect()[0]
    assert b.n_words == 6
    assert b.link_chars == len("and a link")
    assert b.link_density == pytest.approx(10 / 27, abs=1e-4)


# --- WET ---------------------------------------------------------------------


def test_wet_roundtrip_hostile_payload():
    recs = [
        ("https://a.test/1", dt.datetime(2024, 1, 1), "plain text"),
        ("https://a.test/2", dt.datetime(2024, 1, 2, 3, 4, 5),
         "text with\r\nWARC/1.0\r\nContent-Length: 7\r\n\r\nfake record inside"),
        ("https://a.test/3", dt.datetime(2024, 1, 3), "unicode: naïve café — ✓"),
    ]
    for compress in (False, True):
        back = list(warc.parse_wet(warc.build_wet(recs, compress=compress)))
        assert back == recs


def test_wet_parser_skips_response_records():
    # a combined stream: response record (WARC) + conversion record (WET)
    resp = warc.build_record("https://a.test/r", dt.datetime(2024, 1, 1), b"<html>x</html>")
    conv = warc.build_wet_record("https://a.test/c", dt.datetime(2024, 1, 1), "clean text")
    combined = resp + conv
    wet = list(warc.parse_wet(combined))
    assert [u for u, _, _ in wet] == ["https://a.test/c"]
    pages = list(warc.parse_warc(combined))
    assert [u for u, _, _ in pages] == ["https://a.test/r"]


def test_wet_spark_roundtrip_and_file_read(spark, tmp_path):
    df = spark.range(20).select(
        F.concat(F.lit("https://w.test/"), F.col("id")).alias("url"),
        F.timestamp_seconds(F.col("id") + 1_700_000_000).alias("warc_ts"),
        F.concat(F.lit("document body number "), F.col("id")).alias("text"),
    )
    back = warc.wet_roundtrip(df, compress=True)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b

    # file ingestion path
    recs = [(f"https://f.test/{i}", dt.datetime(2024, 2, 1, 0, 0, i), f"body {i}") for i in range(5)]
    (tmp_path / "part0.warc.wet.gz").write_bytes(warc.build_wet(recs, compress=True))
    got = sorted(map(tuple, warc.read_wet(spark, str(tmp_path)).collect()))
    assert got == sorted(recs)


def test_template_shapes_structure_only(spark):
    from spider_spark.operators.content import template_shapes

    rows = [
        # same structure, different text/attrs/case → one shape
        ("a1", "h1", '<div class="x"><p>hello</p></div>'),
        ("a2", "h2", "<DIV id='y'><P>totally other words</P></DIV>"),
        ("a3", "h1", "<div><p>third</p></div>"),
        # different structure (extra span)
        ("b1", "h1", "<div><p>x</p><span>s</span></div>"),
        ("b2", "h1", "<div><p>y</p><span>t</span></div>"),
        # singleton below min_pages
        ("c1", "h9", "<table><tr><td>z</td></tr></table>"),
        ("n1", "h9", None),
        ("n2", "h9", None),
    ]
    df = spark.createDataFrame(rows, "url string, host string, html string")
    out = {
        r["first_id"]: (r["n_pages"], r["n_hosts"], r["n_tags"])
        for r in template_shapes(df, host_col="host").collect()
    }
    # null html pages share the empty shape (0 tags) — still a group
    assert out == {"a1": (3, 2, 4), "b1": (2, 1, 6), "n1": (2, 1, 0)}


def test_markup_density_signals(spark):
    from spider_spark.operators.content import markup_density

    nav = (
        "<html><head><script>junk()</script></head><body>"
        '<a href="/a">Home</a> <a href="/b">About&amp;Co</a>'
        "</body></html>"
    )
    art = "<html><body><p>ten visible words of real article text here</p>" \
          '<a href="/m">more</a></body></html>'
    rows = markup_density(
        spark.createDataFrame(
            [("nav", nav), ("art", art), ("empty", ""), ("null", None)],
            "url string, html string",
        )
    ).collect()
    by = {r["id"]: r for r in rows}
    # nav page: visible text is exactly the anchor texts (entity decoded)
    assert by["nav"]["text_chars"] == len("Home About&Co")
    assert by["nav"]["link_chars"] == len("Home") + len("About&Co")
    assert by["nav"]["link_density_r"] > 0.9
    # article: link density is the 4-char anchor over the full text
    a = by["art"]
    assert a["text_chars"] == len("ten visible words of real article text here more")
    assert a["link_chars"] == 4
    assert 0 < a["link_density_r"] < 0.15
    assert a["text_ratio_r"] > 0.3
    for k in ("empty", "null"):
        r = by[k]
        assert (r["html_chars"], r["text_chars"], r["link_chars"]) == (0, 0, 0)
        assert r["text_ratio_r"] == 0.0 and r["link_density_r"] == 0.0
