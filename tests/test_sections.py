"""Heading outline + section-aware chunking (operators/content.py)."""

from __future__ import annotations

from spider_spark.operators import content as ct

HTML = (
    "<html><head><title>Not A Heading</title>"
    "<script>var h = '<h1>fake</h1>';</script></head>"
    "<body>preamble  text here"
    "<h1 class='t'>Intro &amp; Scope</h1><p>first section body</p>"
    "<h2>Methods</h2><p>second   section</p><p>more</p>"
    "<h3></h3>"
    "<h2>Results</h2>"
    "</body></html>"
)


def _pages(spark, html_rows):
    return spark.createDataFrame(html_rows, "url string, html string")


def test_heading_outline(spark):
    rows = sorted(
        (r["idx"], r["level"], r["heading"])
        for r in ct.heading_outline(
            _pages(spark, [("u", HTML)])
        ).collect()
    )
    assert rows == [
        (0, 1, "Intro & Scope"),
        (1, 2, "Methods"),
        (2, 3, ""),
        (3, 2, "Results"),
    ]


def test_section_chunks(spark):
    rows = {
        r["sec_idx"]: (r["level"], r["heading"], r["sec_text"], r["n_words"])
        for r in ct.section_chunks(_pages(spark, [("u", HTML)])).collect()
    }
    assert rows[0] == (None, None, "preamble text here", 3)
    assert rows[1] == (1, "Intro & Scope", "first section body", 3)
    assert rows[2] == (2, "Methods", "second section more", 3)
    assert rows[3] == (3, "", "", 0)  # empty heading, empty section kept
    assert rows[4] == (2, "Results", "", 0)
    assert len(rows) == 5


def test_empty_preamble_dropped_and_null_html(spark):
    rows = ct.section_chunks(
        _pages(spark, [("a", "<h1>Only</h1>body"), ("b", None), ("c", "just text")])
    ).collect()
    ids = {(r["id"], r["sec_idx"]) for r in rows}
    assert ids == {("a", 1), ("c", 0)}  # a's empty preamble gone; b null -> none
    outline = ct.heading_outline(_pages(spark, [("b", None)])).collect()
    assert outline == []
