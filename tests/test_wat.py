"""WAT connector: metadata records with JSON envelopes — the third
Common Crawl artifact next to WARC (responses) and WET (extracted text).

Reference analog: the engine's extraction surface (scrapeDocument.ts
metadata + links.ts link extraction) is exactly what WAT carries per
page, so wat_from_html is the crawl's export format for link-graph jobs.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spider_spark import warc

TS = dt.datetime(2024, 5, 1, 12, 0, 0)


def test_wat_record_roundtrip_hostile_title():
    # Title carries a bare WARC/1.0 line, CRLFs, quotes, and non-ASCII —
    # strict Content-Length framing + JSON escaping must survive all of it.
    title = 'Hi "q" \r\nWARC/1.0\r\nContent-Length: 9\r\n\r\n — ünïcode'
    links = ["https://a.test/x?y=1&z=2", 'https://b.test/"quoted"']
    blob = warc.build_wat([("https://t.test/p", TS, title, links)])
    out = list(warc.parse_wat(blob))
    assert out == [("https://t.test/p", TS, title, links)]


def test_wat_record_deterministic_and_gzip():
    rec = ("https://t.test/p", TS, "T", ["https://t.test/a"])
    assert warc.build_wat([rec]) == warc.build_wat([rec])
    gz = warc.build_wat([rec, rec], compress=True)
    assert gz[:2] == b"\x1f\x8b"
    assert list(warc.parse_wat(gz)) == [rec, rec]


def test_wat_none_title_and_empty_links():
    blob = warc.build_wat([("https://t.test/p", TS, None, [])])
    ((url, ts, title, links),) = warc.parse_wat(blob)
    assert title is None and links == []


def test_combined_stream_each_parser_picks_its_type():
    # One byte stream holding a response + conversion + metadata record:
    # each parser must yield exactly its own record type.
    resp = warc.build_record("https://t.test/p", TS, b"<html>x</html>")
    wet = warc.build_wet_record("https://t.test/p", TS, "x")
    wat = warc.build_wat_record("https://t.test/p", TS, "T", ["https://t.test/a"])
    stream = resp + wet + wat
    assert len(list(warc.parse_warc(stream))) == 1
    assert len(list(warc.parse_wet(stream))) == 1
    assert len(list(warc.parse_wat(stream))) == 1


def test_wat_bad_json_skipped_not_fatal():
    good = warc.build_wat_record("https://t.test/ok", TS, "T", [])
    bad = good.replace(b'{"Envelope"', b'{"Envelop!!', 1)
    out = list(warc.parse_wat(bad + good))
    assert [u for u, *_ in out] == ["https://t.test/ok"]


def test_read_wat_from_files(spark, tmp_path):
    recs = [
        (f"https://t.test/{i}", TS, f"Title {i}", [f"https://t.test/l/{i}"])
        for i in range(6)
    ]
    (tmp_path / "a.wat.gz").write_bytes(warc.build_wat(recs[:3], compress=True))
    (tmp_path / "b.wat.gz").write_bytes(warc.build_wat(recs[3:], compress=True))
    df = warc.read_wat(spark, str(tmp_path)).orderBy("url")
    rows = df.collect()
    assert [r.url for r in rows] == [u for u, *_ in recs]
    assert rows[0].title == "Title 0"
    assert list(rows[5].links) == ["https://t.test/l/5"]


def test_wat_roundtrip_dataframe(spark):
    pdf = spark.createDataFrame(
        [
            ("https://t.test/1", TS, "A \r\nWARC/1.0", ["https://t.test/a"]),
            ("https://t.test/2", TS, None, []),
        ],
        "url string, warc_ts timestamp, title string, links array<string>",
    )
    out = {r.url: r for r in warc.wat_roundtrip(pdf, compress=True).collect()}
    assert out["https://t.test/1"].title == "A \r\nWARC/1.0"
    assert out["https://t.test/2"].title is None
    assert list(out["https://t.test/2"].links) == []


def test_wat_from_html_uses_engine_extractors(spark):
    # Keep-first link dedupe + WHATWG-relative resolution + title — the
    # reference-parity extractor semantics must show up in the WAT rows.
    html = (
        "<html><head><title>  Doc one  </title></head><body>"
        '<a href="/l/0">a</a><a href="/l/1">b</a><a href="/l/0">dup</a>'
        "</body></html>"
    )
    pdf = spark.createDataFrame(
        [("https://t.test/d/1", TS, html), ("https://t.test/d/2", TS, "<p>no links</p>")],
        "url string, warc_ts timestamp, html string",
    )
    out = {r.url: r for r in warc.wat_from_html(pdf).collect()}
    assert out["https://t.test/d/1"].title == "Doc one"
    assert list(out["https://t.test/d/1"].links) == [
        "https://t.test/l/0",
        "https://t.test/l/1",
    ]
    assert out["https://t.test/d/2"].title is None
    assert list(out["https://t.test/d/2"].links) == []
