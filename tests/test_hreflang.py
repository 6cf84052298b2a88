"""hreflang extraction + reciprocity audit (metarobots)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import metarobots as mr


def _extract(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(mr.col_hreflang_links("html").alias("l")).collect()[0]["l"]


def test_extraction_quote_variants_and_case(spark):
    html = (
        '<link rel="alternate" hreflang="EN" href="/en">'
        "<link rel='Alternate' hreflang='fr-CA' href='/fr'>"
        "<LINK REL=alternate HREFLANG=de HREF=/de>"
    )
    got = [(r["lang"], r["href"]) for r in _extract(spark, html)]
    assert got == [("en", "/en"), ("fr-ca", "/fr"), ("de", "/de")]


def test_missing_attrs_and_other_rels_dropped(spark):
    html = (
        '<link rel="alternate" hreflang="en">'       # no href
        '<link rel="alternate" href="/x">'           # no hreflang
        '<link rel="canonical" href="/c">'           # not alternate
        '<link rel="alternate stylesheet" hreflang="sv" href="/sv">'
    )
    got = [(r["lang"], r["href"]) for r in _extract(spark, html)]
    assert got == [("sv", "/sv")]  # token 'alternate' matches in a rel list


def test_null_html_yields_empty(spark):
    df = spark.createDataFrame([(None,)], "html string")
    got = df.select(mr.col_hreflang_links("html").alias("l")).collect()[0]["l"]
    assert got == []


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def _alt(href):
    return f'<link rel="alternate" hreflang="en" href="{href}">'


def test_reciprocity_pair_dangling_self(spark):
    rows = [
        ("a", _alt("b") + _alt("a")),  # pair + self-reference
        ("b", _alt("a")),
        ("c", _alt("nowhere")),        # dangling
    ]
    got = {
        (r["src"], r["dst"]): r["reciprocal"]
        for r in mr.hreflang_reciprocity(_pages(spark, rows)).collect()
    }
    assert got == {
        ("a", "b"): True,
        ("a", "a"): True,
        ("b", "a"): True,
        ("c", "nowhere"): False,
    }


def test_one_way_not_reciprocal(spark):
    rows = [("a", _alt("b")), ("b", _alt("c")), ("c", _alt("b"))]
    got = {
        (r["src"], r["dst"]): r["reciprocal"]
        for r in mr.hreflang_reciprocity(_pages(spark, rows)).collect()
    }
    assert got == {
        ("a", "b"): False,
        ("b", "c"): True,
        ("c", "b"): True,
    }
