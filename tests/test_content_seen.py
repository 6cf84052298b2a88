"""Mercator content-seen test (Heydon & Najork, WWW 1999 §4.2.1): pages
whose content fingerprint was already captured contribute no outlinks —
offline report (dedup.content_seen_report) and online crawl wiring
(CrawlConfig.content_seen_dedup → extract_new_links' fp_seen side)."""

from __future__ import annotations

import datetime as dt

from spider_spark.crawler import Crawler
from spider_spark.frontier import CrawlConfig
from spider_spark.operators.dedup import content_seen_report


def test_content_seen_report_verdicts(spark):
    caps = spark.createDataFrame(
        [
            ("a", "001", 7),
            ("b", "002", 7),  # dup of a
            ("c", "003", 9),
            ("d", "004", None),  # bodyless — first by definition
            ("e", "005", 7),  # dup of a
        ],
        "url_canon string, seq string, content_fp int",
    )
    out = {r.url_canon: r for r in content_seen_report(caps).collect()}
    assert out["a"].verdict == "first" and out["a"].first_url is None
    assert out["b"].verdict == "duplicate" and out["b"].first_url == "a"
    assert out["e"].verdict == "duplicate" and out["e"].first_url == "a"
    assert out["c"].verdict == "first"
    assert out["d"].verdict == "first" and out["d"].first_url is None


def _mirror_pages(spark):
    """Two hosts serving byte-identical html with a RELATIVE link — the
    canonical mirror case: same content fingerprint, but the link resolves
    to a different absolute URL per host."""
    body = b"<html><title>m</title><a href='/next'>n</a></html>"
    ts = dt.datetime(2024, 1, 1)
    rows = [
        ("https://h0.test/page", ts, body, "m n", "en"),
        ("https://h1.test/page", ts, body, "m n", "en"),
        ("https://h0.test/next", ts, b"<html><title>n0</title></html>", "n0", "en"),
        ("https://h1.test/next", ts, b"<html><title>n1</title></html>", "n1", "en"),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def test_crawl_content_seen_suppresses_mirror_outlinks(spark, tmp_path):
    pages = _mirror_pages(spark)
    seeds = ["https://h0.test/page", "https://h1.test/page"]

    c_off = Crawler(spark, pages, str(tmp_path / "off"), CrawlConfig(per_host_budget=4))
    c_off.run(seeds, max_ticks=3)
    seen_off = {r.url_canon for r in c_off.seen().collect()}
    # without the test both mirrors' links are processed
    assert {"https://h0.test/next", "https://h1.test/next"} <= seen_off

    c_on = Crawler(
        spark,
        pages,
        str(tmp_path / "on"),
        CrawlConfig(per_host_budget=4, content_seen_dedup=True),
    )
    c_on.run(seeds, max_ticks=3)
    seen_on = {r.url_canon for r in c_on.seen().collect()}
    # exactly ONE mirror's outlink survives (the min-seq encounter), and
    # both mirror pages themselves are still fetched and in the ledger
    assert len(seen_on & {"https://h0.test/next", "https://h1.test/next"}) == 1
    caps = {
        r.url_canon
        for r in c_on.results().filter("status = 200").select("url_canon").collect()
    }
    assert {"https://h0.test/page", "https://h1.test/page"} <= caps


def test_crawl_content_seen_cross_tick(spark, tmp_path):
    """A mirror DISCOVERED a tick later contributes nothing either: the fp
    set derives from the latest_capture snapshot of prior ticks."""
    body = b"<html><title>m</title><a href='/next'>n</a></html>"
    ts = dt.datetime(2024, 1, 1)
    rows = [
        # seed page links to the tick-1 mirror
        (
            "https://h0.test/a",
            ts,
            b"<html><a href='https://h1.test/mirror'>x</a></html>" + body,
            "",
            "en",
        ),
        ("https://h0.test/a2", ts, body, "m n", "en"),  # tick-0 copy of the content
        ("https://h1.test/mirror", ts, body, "m n", "en"),
        ("https://h0.test/next", ts, b"<html><title>n</title></html>", "n", "en"),
        ("https://h1.test/next", ts, b"<html><title>n</title></html>", "n", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    c = Crawler(
        spark,
        pages,
        str(tmp_path / "ck"),
        CrawlConfig(per_host_budget=8, content_seen_dedup=True),
    )
    c.run(["https://h0.test/a", "https://h0.test/a2"], max_ticks=4)
    seen = {r.url_canon for r in c.seen().collect()}
    # the mirror itself was discovered and fetched…
    caps = {
        r.url_canon
        for r in c.results().filter("status = 200").select("url_canon").collect()
    }
    assert "https://h1.test/mirror" in caps
    # …but its outlink (h1.test/next) never enqueued: a2 captured the same
    # content at tick 0, so only h0.test/next is in the seen set
    assert "https://h0.test/next" in seen
    assert "https://h1.test/next" not in seen


def test_crawl_content_seen_resume_equivalence(spark, tmp_path):
    """Kill+resume with content_seen_dedup reproduces the uninterrupted
    run's seen set and ledger (the fp side reads checkpointed state only)."""
    pages = _mirror_pages(spark)
    seeds = ["https://h0.test/page", "https://h1.test/page"]
    cfg = lambda: CrawlConfig(per_host_budget=1, content_seen_dedup=True)  # noqa: E731

    c_full = Crawler(spark, pages, str(tmp_path / "full"), cfg())
    c_full.run(seeds, max_ticks=5)

    c_a = Crawler(spark, pages, str(tmp_path / "cut"), cfg())
    c_a.run(seeds, max_ticks=2)
    c_b = Crawler(spark, pages, str(tmp_path / "cut"), cfg())
    c_b.run(max_ticks=5)

    full = sorted((r.url_canon, r.tick, r.status) for r in c_full.results().select("url_canon", "tick", "status").collect())
    cut = sorted((r.url_canon, r.tick, r.status) for r in c_b.results().select("url_canon", "tick", "status").collect())
    assert full == cut
    assert {r.url_canon for r in c_full.seen().collect()} == {
        r.url_canon for r in c_b.seen().collect()
    }
