"""JSON-LD + OpenGraph extraction (operators/structured.py)."""

from __future__ import annotations

from spider_spark.operators import structured as st

HTML = (
    "<html><head>"
    '<meta property="og:title" content="The Title">'
    "<meta property='og:type' content='article'>"
    "<META PROPERTY=og:image CONTENT=https://x.example/i.png>"
    '<meta name="description" content="not og">'
    '<script type="application/ld+json">'
    '{"@type": "Article", "headline": "Big News", '
    '"datePublished": "2024-05-01"}'
    "</script>"
    "<script type='application/ld+json'>{broken json</script>"
    '<script type="application/ld+json">'
    '{"@type": "Product", "name": "Widget"}'
    "</script>"
    "<script>var x = 1;</script>"
    "</head><body>text</body></html>"
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_jsonld_entities(spark):
    rows = {
        r["ld_idx"]: (
            r["ld_type"], r["name"], r["headline"],
            r["date_published"], r["valid"],
        )
        for r in st.jsonld_entities(_pages(spark, [("u", HTML)])).collect()
    }
    assert rows[0] == ("Article", None, "Big News", "2024-05-01", True)
    assert rows[1] == (None, None, None, None, False)  # broken json
    assert rows[2] == ("Product", "Widget", None, None, True)
    assert len(rows) == 3


def test_og_properties(spark):
    rows = [
        (r["og_idx"], r["prop"], r["content"])
        for r in sorted(
            st.og_properties(_pages(spark, [("u", HTML)])).collect(),
            key=lambda r: r["og_idx"],
        )
    ]
    assert rows == [
        (0, "og:title", "The Title"),
        (1, "og:type", "article"),
        (2, "og:image", "https://x.example/i.png"),
    ]


def test_null_html_and_no_islands(spark):
    out = st.jsonld_entities(
        _pages(spark, [("a", None), ("b", "<p>plain</p>")])
    ).collect()
    assert out == []
    assert st.og_properties(_pages(spark, [("a", None)])).collect() == []


def test_title_consistency(spark):
    cases = [
        (0, "<title>Big  News</title>"
            '<meta property="og:title" content="BIG NEWS">'
            "<h1>Big News</h1>", ("big news", "big news", "big news", True, True)),
        (1, "<title>A &amp; B</title><h1>something else</h1>",
            ("a & b", None, "something else", False, False)),
        (2, "<h1>Only H1</h1>", (None, None, "only h1", False, False)),
        (3, None, (None, None, None, False, False)),
        (4, "<title></title><h1>  </h1>", (None, None, None, False, False)),
    ]
    df = spark.createDataFrame(
        [(str(i), h) for i, h, _ in cases], "url string, html string"
    )
    got = {
        int(r["id"]): (
            r["title"], r["og_title"], r["h1"],
            r["title_eq_og"], r["title_eq_h1"],
        )
        for r in st.title_consistency(df).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, i
