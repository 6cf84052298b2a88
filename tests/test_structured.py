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


def test_html_tables_basic(spark):
    html = (
        "<html><body>"
        "<TABLE class='x'><tr><th>Name</th><th>Qty</th></tr>"
        "<tr><td><b>v</b>7_1</td><td>71 &amp; up</td></tr>"
        "<tr><td>a</td><td>b</td><td>c</td></tr></TABLE>"
        "<table><tr><td>only</td></tr></table>"
        "</body></html>"
    )
    rows = st.html_tables(_pages(spark, [("u", html)])).collect()
    got = {
        (r["table_idx"], r["row_idx"]): (
            r["cells_joined"], r["n_cells"], r["header"]
        )
        for r in rows
    }
    assert got == {
        (0, 0): ("Name|Qty", 2, True),
        # nested tag stripped to a space then collapsed; entity decoded
        (0, 1): ("v 7_1|71 & up", 2, False),
        (0, 2): ("a|b|c", 3, False),
        (1, 0): ("only", 1, False),
    }


def test_html_tables_edge_cases(spark):
    rows = st.html_tables(
        _pages(
            spark,
            [
                ("none", "<p>no tables here</p>"),
                ("null", None),
                # row with no cells still surfaces (n_cells 0)
                ("empty", "<table><tr></tr></table>"),
                # attributes on tr/td, mixed case, th mid-row
                (
                    "attrs",
                    '<table><tr class="r"><td colspan="2">A</td>'
                    "<TH>H</TH></tr></table>",
                ),
            ],
        )
    ).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    assert "none" not in by_id and "null" not in by_id
    (e,) = by_id["empty"]
    assert (e["cells_joined"], e["n_cells"], e["header"]) == ("", 0, False)
    (a,) = by_id["attrs"]
    assert (a["cells_joined"], a["n_cells"], a["header"]) == ("A|H", 2, True)


def test_publish_date_fusion_precedence(spark):
    from spider_spark.operators.structured import publish_date_fusion

    ld = ('<script type="application/ld+json">'
          '{"@type": "Article", "datePublished": "2022-03-14T09:00:00Z"}'
          "</script>")
    meta = ('<meta property="article:published_time" '
            'content="2023-11-20T12:00:00+00:00">')
    cases = [
        ("ld", f"<html><head>{ld}</head></html>", "https://x.test/p",
         ("2022-03-14", "jsonld")),
        ("meta", f"<html><head>{meta}</head></html>", "https://x.test/p",
         ("2023-11-20", "meta")),
        ("url", "<html></html>", "https://x.test/2020/07/04/a",
         ("2020-07-04", "url")),
        # precedence: jsonld beats meta beats url
        ("all", f"<html><head>{ld}{meta}</head></html>",
         "https://x.test/2020/07/04/a", ("2022-03-14", "jsonld")),
        # broken jsonld falls through to meta
        ("broken", "<html><head><script type='application/ld+json'>"
                   f"{{oops</script>{meta}</head></html>",
         "https://x.test/p", ("2023-11-20", "meta")),
        # invalid url date (month 13) yields nothing
        ("badurl", "<html></html>", "https://x.test/2020/13/04/a",
         (None, None)),
        ("none", "<html><body>plain</body></html>", "https://x.test/p",
         (None, None)),
        ("null", None, "https://x.test/p", (None, None)),
    ]
    df = spark.createDataFrame(
        [(n, h, u) for n, h, u, _ in cases],
        "name string, html string, url string",
    )
    got = {
        r["id"]: (r["pub_date"], r["pub_source"])
        for r in publish_date_fusion(df, id_col="name", url_col="url").collect()
    }
    for n, _, _, want in cases:
        assert got[n] == want, n
