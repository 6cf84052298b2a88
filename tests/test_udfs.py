"""Vectorized UDF parity vs the scalar core, on the synthetic pages table."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import synth, textops, udfs, urlops


def test_strip_udf_byte_identical(spark):
    pages = synth.generate_pages(spark, 80, 6)
    diff = (
        pages.withColumn("extracted", udfs.strip_html_text(F.col("html")))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert diff == 0  # the north-rule invariant: byte-identical text per URL


def test_parse_page_matches_scalar_core(spark):
    pages = synth.generate_pages(spark, 40, 4)
    rows = (
        pages.withColumn("parsed", udfs.parse_page(F.col("url"), F.col("html")))
        .select("url", "html", "parsed")
        .collect()
    )
    assert rows
    for r in rows:
        html = bytes(r.html).decode("utf-8")
        expected_links = textops.extract_html_links(html, r.url)
        got = r.parsed
        assert got.text == textops.strip_html_to_text(html)
        assert [l.href for l in got.links] == [l.href for l in expected_links]
        meta = textops.extract_html_metadata(html)
        assert got.title == meta["title"] and got.description == meta["description"]
        det = textops.detect_document_url(r.url, html)
        if det is None:
            assert got.detected is None
        else:
            assert got.detected.url == det["url"] and got.detected.strategy == det["strategy"]


def test_canonicalize_and_host_udfs(spark):
    urls = [
        "HTTP://Example.com/a/../b#f",
        "https://h.com/download/x",
        "mailto:x@y",
        "https://site.test/page/1?q=2",
        "notaurl",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = df.select(
        udfs.canonicalize_url("url").alias("c"), udfs.url_host("url").alias("h")
    ).collect()
    for u, row in zip(urls, got):
        assert row.c == urlops.canonicalize_url(u)
        assert row.h == urlops.url_host(u)


def test_filter_links_predicate_matches_scalar(spark):
    links = [
        ("https://h/minutes/2026", "Meeting minutes"),
        ("https://h/agenda/2026", "Agenda"),
        ("https://h/about", "About"),
        ("https://h/minutes/draft", "Draft minutes"),
        ("", "empty"),
    ]
    cfg = {"urlContains": ["minutes"], "textContains": ["agenda"], "excludes": ["draft"]}
    df = spark.createDataFrame(links, "href string, text string")
    got = [
        r.href
        for r in df.filter(udfs.col_filter_links_predicate(F.col("href"), F.col("text"), cfg))
        .collect()
    ]
    expected = [
        l.href
        for l in textops.filter_links(
            [textops.Link(href=h, text=t) for h, t in links], {**cfg, "dedupe": False}
        )
    ]
    assert got == expected


def test_doc_extension_predicate(spark):
    df = spark.createDataFrame(
        [("https://h/a.PDF",), ("https://h/b.docx",), ("https://h/c.html",)], "href string"
    )
    got = [r.href for r in df.filter(udfs.col_doc_extension_predicate(F.col("href"))).collect()]
    assert got == ["https://h/a.PDF", "https://h/b.docx"]


def test_pure_expr_helpers(spark):
    df = spark.createDataFrame(
        [("https://h/x.pdf", "%PDF-"), ("https://h/y", "<html>")], "url string, content string"
    )
    rows = df.select(
        udfs.col_is_pdf_file(F.col("url")).alias("f"),
        udfs.col_is_pdf_page(F.col("url"), F.col("content")).alias("p"),
    ).collect()
    assert [(r.f, r.p) for r in rows] == [(True, True), (False, False)]


def test_strip_tracking_params(spark):
    from spider_spark import udfs

    cases = [
        ("https://a.test/p?utm_source=x&id=5&utm_campaign=y", "https://a.test/p?id=5"),
        ("https://a.test/p?utm_source=x", "https://a.test/p"),
        ("https://a.test/p?id=5", "https://a.test/p?id=5"),
        ("https://a.test/p", "https://a.test/p"),
        ("https://a.test/p?gclid=abc&fbclid=z&a=1&b=2", "https://a.test/p?a=1&b=2"),
        ("https://a.test/p?_hsenc=q&mc_eid=m&utm_medium=e", "https://a.test/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.s for r in df.select(udfs.col_strip_tracking_params("url").alias("s")).collect()]
    assert got == [want for _, want in cases]
