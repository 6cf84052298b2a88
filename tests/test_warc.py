"""WARC source reader: build → parse roundtrips, file ingestion, and the
distributed executor-side roundtrip."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spider_spark import synth, warc

TS = dt.datetime(2024, 1, 1, 12, 0, 0)


def _sample_records():
    return [
        (f"https://w.test/page/{i}", TS + dt.timedelta(seconds=i), f"<html><body>doc {i} é</body></html>".encode())
        for i in range(5)
    ]


def test_parse_roundtrip_plain_and_gzip():
    recs = _sample_records()
    for compress in (False, True):
        blob = warc.build_warc(recs, compress=compress)
        out = list(warc.parse_warc(blob))
        assert out == recs


def test_build_is_deterministic():
    recs = _sample_records()
    assert warc.build_warc(recs, compress=True) == warc.build_warc(recs, compress=True)


def test_non_response_records_skipped():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields\r\n"
        b"Content-Length: 10\r\n\r\nrobots: ok\r\n\r\n"
    )
    recs = _sample_records()[:2]
    out = list(warc.parse_warc(info + warc.build_warc(recs)))
    assert out == recs


def test_payload_containing_warc_magic_does_not_desync():
    evil = [("https://w.test/evil", TS, b"<html>WARC/1.0\r\nWARC-Type: response\r\n\r\n</html>")]
    recs = evil + _sample_records()[:1]
    assert list(warc.parse_warc(warc.build_warc(recs))) == recs


def test_fractional_second_warc_date_roundtrip():
    # WARC 1.1 fractional seconds (warcio/wget/Heritrix emit these)
    recs = [("https://w.test/f", TS + dt.timedelta(microseconds=123456), b"<html>f</html>")]
    assert list(warc.parse_warc(warc.build_warc(recs))) == recs
    # foreign fractional form parses even when we didn't write it
    foreign = warc.build_record(recs[0][0], recs[0][1], recs[0][2])
    assert b"2024-01-01T12:00:00.123456Z" in foreign


def test_unparseable_warc_date_degrades_to_epoch():
    rec = warc.build_record("https://w.test/x", TS, b"<html></html>")
    broken = rec.replace(b"WARC-Date: 2024-01-01T12:00:00Z", b"WARC-Date: not-a-date\x00\x00\x00\x00\x00\x00")
    [(url, ts, html)] = list(warc.parse_warc(broken))
    assert ts == dt.datetime(1970, 1, 1)


def test_corrupt_content_length_stops_file_not_job():
    import re

    good = warc.build_warc(_sample_records()[:1])
    bad = re.sub(
        rb"Content-Length: (\d+)\r\n\r\nHTTP",
        rb"Content-Length: \1zz\r\n\r\nHTTP",
        warc.build_record("https://w.test/bad", TS, b"x"),
    )
    assert b"zz\r\n" in bad  # the WARC-level length is now non-numeric
    # the good prefix parses; the corrupt record ends the file gracefully
    out = list(warc.parse_warc(good + bad))
    assert [u for u, _, _ in out] == ["https://w.test/page/0"]


def test_read_warc_file(spark, tmp_path):
    recs = _sample_records()
    plain, gz = tmp_path / "a.warc", tmp_path / "b.warc.gz"
    plain.write_bytes(warc.build_warc(recs[:3]))
    gz.write_bytes(warc.build_warc(recs[3:], compress=True))
    df = warc.read_warc(spark, str(tmp_path))
    rows = sorted(
        (r.url, r.warc_ts, bytes(r.html)) for r in df.collect()
    )
    assert rows == sorted(recs)
    assert df.schema == synth.PAGES_SCHEMA


def test_roundtrip_pages_distributed(spark):
    pages = synth.generate_pages(spark, 50, n_hosts=4).repartition(4)
    back = warc.roundtrip_pages(pages, compress=True)
    a = {(r.url, r.warc_ts, bytes(r.html)) for r in pages.select("url", "warc_ts", "html").collect()}
    b = {(r.url, r.warc_ts, bytes(r.html)) for r in back.collect()}
    assert a == b


def test_surt_transform(spark):
    cases = [
        ("https://www.example.com/a/b?b=2&a=1", "com,example,www)/a/b?a=1&b=2"),
        ("https://example.com/", "com,example)/"),
        ("https://sub.x.org/p", "org,x,sub)/p"),
        ("https://example.com/q?only=1", "com,example)/q?only=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.s for r in df.select(warc.col_surt("url").alias("s")).collect()]
    assert got == [s for _, s in cases]


def test_cdx_index_sorted_and_digested(spark):
    import hashlib

    pages = spark.createDataFrame(
        [
            ("https://b.test/x", TS, b"<html>b</html>"),
            ("https://a.test/y", TS, b"<html>a</html>"),
        ],
        "url string, warc_ts timestamp, html binary",
    )
    rows = warc.cdx_index(pages).collect()
    assert [r.surt for r in rows] == ["test,a)/y", "test,b)/x"]  # SURT order
    assert rows[0].cdx_ts == "20240101120000"
    assert rows[0].digest == hashlib.sha256(b"<html>a</html>").hexdigest()


def test_warc_pages_drive_a_crawl_tick(spark, tmp_path):
    """WARC-ingested pages are a drop-in pages table for the crawler."""
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    pages = synth.generate_pages(spark, 40, n_hosts=2)
    recs = [
        (r.url, r.warc_ts, bytes(r.html))
        for r in pages.select("url", "warc_ts", "html").collect()
    ]
    (tmp_path / "corpus.warc.gz").write_bytes(warc.build_warc(recs, compress=True))
    ingested = warc.read_warc(spark, str(tmp_path / "corpus.warc.gz"))
    cfg = CrawlConfig(per_host_budget=4, respect_robots=False)
    c = Crawler(spark, ingested, str(tmp_path / "ckpt"), cfg)
    stats = c.run(synth.seed_urls(40, 2), max_ticks=2)
    assert sum(s.ok for s in stats) > 0
