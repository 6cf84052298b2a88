"""Transient-failure retry with exponential backoff: the pure policy
operator (recrawl.retry_backoff_plan) and its online form in the Crawler
(cfg.retry_transient + catalog retry_state snapshots).

Reference analog: Crawlee's maxRequestRetries pass-through in the
reference's scraper config; the schedule itself is the standard
Nutch/Heritrix discipline (retry after base·2^(attempts−1), reset on a
non-transient capture, give up past the cap)."""

from __future__ import annotations

import pandas as pd
import pytest

from spider_spark import fetch, synth
from spider_spark.crawler import Crawler
from spider_spark.frontier import CrawlConfig
from spider_spark.operators.recrawl import retry_backoff_plan


# --- policy operator ---------------------------------------------------------


def _captures(spark, rows):
    return spark.createDataFrame(
        rows, "url_canon string, tick int, seq string, status int"
    )


def test_retry_plan_schedule_reset_and_give_up(spark):
    df = _captures(
        spark,
        [
            ("ok", 0, "a", 200),  # fresh — not returned
            ("one", 0, "b", 599),  # first failure
            ("two", 0, "c", 599),
            ("two", 1, "d", 599),  # second consecutive
            ("dead", 0, "e", 599),
            ("dead", 1, "f", 599),
            ("dead", 2, "g", 599),
            ("dead", 3, "h", 599),  # 4th > max_retries=3
            ("reset", 0, "i", 599),
            ("reset", 1, "j", 200),  # success resets the counter
            ("reset", 2, "k", 599),  # new run of 1
            ("healed", 0, "l", 599),
            ("healed", 1, "m", 200),  # latest capture ok — not returned
        ],
    )
    out = {
        r.url_canon: r
        for r in retry_backoff_plan(
            df, max_retries=3, base_delay_ticks=1, max_delay_ticks=64
        ).collect()
    }
    assert set(out) == {"one", "two", "dead", "reset"}
    assert (out["one"].attempts, out["one"].verdict, out["one"].due_tick) == (1, "retry", 1)
    assert (out["two"].attempts, out["two"].verdict, out["two"].due_tick) == (2, "retry", 3)
    assert (out["dead"].attempts, out["dead"].verdict, out["dead"].due_tick) == (4, "give_up", None)
    assert (out["reset"].attempts, out["reset"].verdict, out["reset"].due_tick) == (1, "retry", 3)


def test_retry_plan_delay_cap(spark):
    rows = [("u", t, chr(97 + t), 599) for t in range(5)]
    out = retry_backoff_plan(
        _captures(spark, rows),
        max_retries=10,
        base_delay_ticks=1,
        max_delay_ticks=8,
    ).collect()[0]
    # attempts=5 → uncapped delay 16, capped to 8
    assert out.attempts == 5 and out.due_tick == 4 + 8


def test_retry_plan_custom_transient_set(spark):
    df = _captures(spark, [("u", 0, "a", 503), ("v", 0, "b", 599)])
    out = retry_backoff_plan(df, transient_statuses=(503,))
    assert [r.url_canon for r in out.collect()] == ["u"]


# --- crawler integration -----------------------------------------------------


def _always_fail_transport(pages: dict, bad: set):
    table = fetch.make_table_transport(pages)

    def transport(url, headers, timeout):
        if url in bad:
            raise OSError("connection reset")  # → 599 status row
        return table(url, headers, timeout)

    return transport


def _crawl_cfg(**kw):
    return CrawlConfig(
        adapter="live",
        retry_transient=True,
        per_host_budget=8,
        **kw,
    )


def test_crawl_retries_follow_backoff_then_give_up(spark, tmp_path):
    """A URL that always 599s is re-fetched at ticks 0, 1, 3, 7 (base 1,
    doubling) and then dropped for good after retry_max=3 retries; the
    healthy URL on the same host is fetched exactly once."""
    pages = {"https://h0.test/ok": b"<html><title>ok</title></html>"}
    tp = _always_fail_transport(pages, {"https://h0.test/boom"})
    c = Crawler(
        spark,
        synth.generate_pages(spark, 4, n_hosts=1),  # unused by the live stage
        str(tmp_path / "ck"),
        _crawl_cfg(max_ticks=12),
        transport=tp,
    )
    c.run(["https://h0.test/ok", "https://h0.test/boom"], max_ticks=12)
    caps = (
        c.results()
        .filter("url_canon = 'https://h0.test/boom'")
        .select("tick", "status")
        .collect()
    )
    assert sorted((r.tick, r.status) for r in caps) == [
        (0, 599),
        (1, 599),
        (3, 599),
        (7, 599),
    ]
    ok = c.results().filter("url_canon = 'https://h0.test/ok'").collect()
    assert [(r.tick, r.status) for r in ok] == [(0, 200)]
    # state drained after the give-up
    final = c.catalog.load_retry_state(spark, c.catalog.committed_tick() + 1)
    assert final is None or final.count() == 0


def test_crawl_retry_succeeds_after_transient_failure(spark, tmp_path):
    """Fail-once-then-succeed transport: the retry lands a 200 on the next
    tick and the retry state clears (the counter-reset path end-to-end)."""
    marker = tmp_path / "served_once"
    url = "https://h0.test/flaky"
    body = b"<html><title>flaky</title><p>recovered</p></html>"

    def transport(u, headers, timeout, _marker=str(marker), _url=url, _body=body):
        if u == _url:
            import os

            if not os.path.exists(_marker):
                with open(_marker, "w") as f:
                    f.write("x")
                raise OSError("first attempt fails")
            return 200, {"Content-Type": "text/html"}, _body
        return 404, {}, b""

    c = Crawler(
        spark,
        synth.generate_pages(spark, 4, n_hosts=1),
        str(tmp_path / "ck"),
        _crawl_cfg(max_ticks=6),
        transport=transport,
    )
    c.run([url], max_ticks=6)
    caps = sorted(
        (r.tick, r.status)
        for r in c.results().filter(f"url_canon = '{url}'").select("tick", "status").collect()
    )
    assert caps == [(0, 599), (1, 200)]
    final = c.catalog.load_retry_state(spark, c.catalog.committed_tick() + 1)
    assert final is None or final.count() == 0
    # the recovered capture extracted real text
    got = c.results().filter(f"url_canon = '{url}' AND status = 200").collect()[0]
    assert "recovered" in (got.text or "")


def test_crawl_retry_resume_replays_same_schedule(spark, tmp_path):
    """Kill-and-resume across a pending backoff window reproduces the
    uninterrupted run's ledger exactly (retry state is checkpointed like
    frontier/seen — the north-rule resume invariant extends to retries)."""
    pages = {"https://h0.test/ok": b"<html><title>ok</title></html>"}
    tp = _always_fail_transport(pages, {"https://h0.test/boom"})
    seeds = ["https://h0.test/ok", "https://h0.test/boom"]
    corpus = synth.generate_pages(spark, 4, n_hosts=1)

    c_full = Crawler(spark, corpus, str(tmp_path / "full"), _crawl_cfg(max_ticks=12), transport=tp)
    c_full.run(seeds, max_ticks=12)

    c_a = Crawler(spark, corpus, str(tmp_path / "cut"), _crawl_cfg(max_ticks=12), transport=tp)
    c_a.run(seeds, max_ticks=2)  # killed mid-backoff (retry due at tick 3)
    c_b = Crawler(spark, corpus, str(tmp_path / "cut"), _crawl_cfg(max_ticks=12), transport=tp)
    c_b.run(max_ticks=12)  # resume

    full = sorted(
        (r.url_canon, r.tick, r.status) for r in c_full.results().select("url_canon", "tick", "status").collect()
    )
    cut = sorted(
        (r.url_canon, r.tick, r.status) for r in c_b.results().select("url_canon", "tick", "status").collect()
    )
    assert full == cut and len(full) >= 5
