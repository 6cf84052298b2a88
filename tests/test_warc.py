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


def _lookup_fixture(spark):
    """Two hosts, two captures of one URL (for latest_only), plus a
    same-host URL outside every queried path prefix."""
    pages = spark.createDataFrame(
        [
            ("https://a.test/docs/1", TS, b"<html>v1</html>"),
            ("https://a.test/docs/1", TS + dt.timedelta(days=1), b"<html>v2</html>"),
            ("https://a.test/docs/2", TS, b"<html>d2</html>"),
            ("https://a.test/other/9", TS, b"<html>no</html>"),
            ("https://b.test/docs/1", TS, b"<html>bb</html>"),
        ],
        "url string, warc_ts timestamp, html binary",
    )
    index = warc.cdx_index(pages)
    prefixes = spark.createDataFrame([("test,a)/docs/",), ("test,c)/",)], "prefix string")
    return index, prefixes


def test_cdx_lookup_prefix_scoped_to_host_key(spark):
    """Only a.test /docs/ captures match; b.test and /other/ excluded;
    the unmatched prefix test,c)/ yields nothing (inner join)."""
    index, prefixes = _lookup_fixture(spark)
    rows = warc.cdx_lookup(index, prefixes).orderBy("surt", "cdx_ts").collect()
    assert [(r.surt, r.cdx_ts) for r in rows] == [
        ("test,a)/docs/1", "20240101120000"),
        ("test,a)/docs/1", "20240102120000"),
        ("test,a)/docs/2", "20240101120000"),
    ]
    assert all(r.prefix == "test,a)/docs/" for r in rows)


def test_cdx_lookup_latest_only_keeps_newest_capture(spark):
    import hashlib

    index, prefixes = _lookup_fixture(spark)
    rows = warc.cdx_lookup(index, prefixes, latest_only=True).orderBy("surt").collect()
    assert [(r.surt, r.cdx_ts) for r in rows] == [
        ("test,a)/docs/1", "20240102120000"),
        ("test,a)/docs/2", "20240101120000"),
    ]
    assert rows[0].digest == hashlib.sha256(b"<html>v2</html>").hexdigest()


def test_cdx_lookup_broadcast_gate_plans_and_parity(spark):
    """broadcast=True plans a broadcast join of the prefix side;
    broadcast=False shuffles on the host key — identical rows either way."""
    index, prefixes = _lookup_fixture(spark)
    bc = warc.cdx_lookup(index, prefixes, broadcast=True)
    sh = warc.cdx_lookup(index, prefixes, broadcast=False)
    assert "BroadcastHashJoin" in bc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in sh._jdf.queryExecution().executedPlan().toString()
    assert sorted(map(tuple, bc.collect())) == sorted(map(tuple, sh.collect()))


# --- Revisit records (WARC 1.1 §6.7.2, identical-payload-digest) ------------


def test_revisit_record_roundtrip_bytes():
    """build_revisit_record → parse_archive surfaces the pointers; the
    stored response's digest is recomputed from its body."""
    body = b"<html>once</html>"
    resp = warc.build_record("https://a.test/p", TS, body)
    rev = warc.build_revisit_record(
        "https://a.test/p",
        TS + dt.timedelta(days=1),
        warc.payload_digest(body),
        "https://a.test/p",
        TS,
    )
    recs = list(warc.parse_archive(resp + rev))
    assert [r["kind"] for r in recs] == ["response", "revisit"]
    assert recs[0]["digest"] == recs[1]["digest"] == warc.payload_digest(body)
    assert recs[1]["html"] is None
    assert recs[1]["refers_to_url"] == "https://a.test/p"
    assert recs[1]["refers_to_ts"] == TS
    # plain parse_warc skips the bodiless revisit entirely
    assert len(list(warc.parse_warc(resp + rev))) == 1


def test_revisit_plan_first_capture_wins(spark):
    """Identical payloads collapse to one stored response (earliest ts,
    url tiebreak); distinct payloads all store."""
    pages = spark.createDataFrame(
        [
            ("https://a.test/1", TS + dt.timedelta(days=1), b"same"),
            ("https://b.test/1", TS, b"same"),
            ("https://b.test/2", TS, b"same"),  # ts tie → url order
            ("https://c.test/1", TS, b"other"),
        ],
        "url string, warc_ts timestamp, html binary",
    )
    rows = {r.url: r for r in warc.revisit_plan(pages).collect()}
    assert rows["https://b.test/1"].kind == "response"
    assert rows["https://b.test/2"].kind == "revisit"
    assert rows["https://a.test/1"].kind == "revisit"
    assert rows["https://c.test/1"].kind == "response"
    assert rows["https://a.test/1"].refers_to_url == "https://b.test/1"
    assert rows["https://a.test/1"].html is None
    assert bytes(rows["https://c.test/1"].html) == b"other"


def test_archive_roundtrip_and_hydration_restores_pages(spark):
    """pages → revisit_plan → WARC bytes → parse → hydrate ≡ pages, with
    payload bytes stored exactly once per distinct digest."""
    pages = synth.generate_pages(spark, 30, n_hosts=3).select("url", "warc_ts", "html")
    dup = pages.limit(10).select(
        F.concat(F.col("url"), F.lit("?copy=1")).alias("url"),
        (F.col("warc_ts") + F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
        "html",
    )
    allp = pages.unionByName(dup)
    recs = warc.archive_roundtrip(allp, compress=True).persist()
    kinds = {r["kind"]: r["count"] for r in recs.groupBy("kind").count().collect()}
    assert kinds == {"response": 30, "revisit": 10}
    got = warc.hydrate_revisits(recs)
    want = allp.select("url", "warc_ts", F.sha2("html", 256).alias("d"))
    have = got.select("url", "warc_ts", F.sha2("html", 256).alias("d"))
    assert want.exceptAll(have).count() == 0 and have.exceptAll(want).count() == 0
    recs.unpersist()


def test_hydrate_orphan_revisit_keeps_null_body(spark):
    recs = spark.createDataFrame(
        [("https://x.test/a", TS, "revisit", None, "sha256:dead", "https://gone.test/", TS)],
        warc._REVISIT_FIELDS,
    )
    rows = warc.hydrate_revisits(recs).collect()
    assert len(rows) == 1 and rows[0].html is None
