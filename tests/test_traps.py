"""Spider-trap guard: structural predicates, pattern grouping, the
per-pattern cap's two-phase window, and the crawl-loop wiring (trapped
URLs never fetched, never in url_seen, resume-exact)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spider_spark.operators import traps


def _df(spark, rows):
    return spark.createDataFrame(rows, "url_canon string, seq string")


def _reasons(df):
    return {
        r["url_canon"]: r["trap_reason"]
        for r in df.select("url_canon", "trap_reason").collect()
    }


def test_structural_reasons_first_match_wins(spark):
    rows = [
        ("https://a.test/ok/page", "01"),
        ("https://a.test/" + "x" * 3000, "02"),  # too_long
        ("https://a.test/" + "/".join(f"s{i}" for i in range(20)), "03"),
        ("https://a.test/p?" + "&".join(f"k{i}=v" for i in range(12)), "04"),
        ("https://a.test/a/b/a/b/a/b", "05"),  # repeated_segment
        ("https://a.test/a/b/a/b", "06"),  # only 2 repeats → clean
    ]
    got = _reasons(traps.trap_tag(_df(spark, rows)))
    assert got[rows[0][0]] is None
    assert got[rows[1][0]] == "too_long"
    assert got[rows[2][0]] == "too_many_segments"
    assert got[rows[3][0]] == "too_many_params"
    assert got[rows[4][0]] == "repeated_segment"
    assert got[rows[5][0]] is None


def test_url_pattern_groups_calendar_family(spark):
    df = _df(
        spark,
        [
            ("https://a.test/cal/2024/05/31", "01"),
            ("https://a.test/cal/2019/12/01", "02"),
            ("https://a.test/doc/deadbeefcafebabe", "03"),  # hex id → H
            ("https://b.test/cal/2024/05/31", "04"),  # other host
        ],
    )
    pats = {
        r["url_canon"]: r["url_pattern"]
        for r in traps.trap_tag(df).select("url_canon", "url_pattern").collect()
    }
    assert pats["https://a.test/cal/2024/05/31"] == "a.test/cal/N/N/N"
    assert (
        pats["https://a.test/cal/2024/05/31"]
        == pats["https://a.test/cal/2019/12/01"]
    )
    assert pats["https://a.test/doc/deadbeefcafebabe"] == "a.test/doc/H"
    assert pats["https://b.test/cal/2024/05/31"] == "b.test/cal/N/N/N"


def test_pattern_cap_keeps_first_k_by_seq(spark):
    rows = [(f"https://a.test/cal/2024/01/{d:02d}", f"{d:02d}") for d in range(1, 31)]
    rows.append(("https://a.test/about", "99"))
    tagged = traps.trap_tag(_df(spark, rows), max_per_pattern=5)
    kept = sorted(
        r["url_canon"]
        for r in tagged.filter(F.col("trap_reason").isNull()).collect()
    )
    # first 5 calendar days by seq survive, plus the unrelated page
    assert kept == sorted(
        [f"https://a.test/cal/2024/01/{d:02d}" for d in range(1, 6)]
        + ["https://a.test/about"]
    )
    capped = tagged.filter(F.col("trap_reason") == "pattern_cap")
    assert capped.count() == 25


def test_pattern_cap_two_phase_equals_single_window(spark):
    rows = [
        (f"https://h{i % 3}.test/p/{i}/x", f"{i:04d}") for i in range(200)
    ]
    tagged = traps.trap_tag(
        _df(spark, rows), max_per_pattern=7, pattern_salt=4
    )
    kept = {
        r["url_canon"]
        for r in tagged.filter(F.col("trap_reason").isNull()).collect()
    }
    # oracle: plain per-pattern first-7-by-seq
    expect = set()
    per = {}
    for url, seq in sorted(rows, key=lambda t: t[1]):
        host = url.split("/")[2]
        pat = f"{host}/p/N/x"
        per.setdefault(pat, 0)
        if per[pat] < 7:
            expect.add(url)
            per[pat] += 1
    assert kept == expect
    # row conservation: every input row exactly once
    assert tagged.count() == len(rows)


def test_trap_filter_drops_tag_columns(spark):
    df = _df(spark, [("https://a.test/a/b/a/b/a/b", "01"), ("https://a.test/x", "02")])
    out = traps.trap_filter(df)
    assert out.columns == ["url_canon", "seq"]
    assert [r["url_canon"] for r in out.collect()] == ["https://a.test/x"]


def test_crawl_with_trap_guard_bounds_frontier_and_seen(spark, tmp_path):
    """End-to-end: a crawl with the guard enqueues at most k calendar
    URLs per tick, trapped URLs never appear in url_seen, and the run is
    replay-exact (same seen set across two independent runs)."""
    import datetime

    from spider_spark import textops
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig
    from spider_spark.synth import PAGES_SCHEMA

    cal_links = "".join(
        f'<a href="/cal/2024/{m:02d}/{d:02d}">c</a>'
        for m in range(1, 5)
        for d in range(1, 11)
    )
    norm_links = "".join(f'<a href="/page/{i}/about">p</a>' for i in range(3))
    index_html = f"<html><body>{cal_links}{norm_links}</body></html>"
    leaf_html = "<html><body>leaf</body></html>"
    ts = datetime.datetime(2024, 1, 1)
    urls = (
        ["https://t.test/"]
        + [
            f"https://t.test/cal/2024/{m:02d}/{d:02d}"
            for m in range(1, 5)
            for d in range(1, 11)
        ]
        + [f"https://t.test/page/{i}/about" for i in range(3)]
    )
    rows = [
        (
            u,
            ts,
            (index_html if i == 0 else leaf_html).encode(),
            textops.strip_html_to_text(index_html if i == 0 else leaf_html),
            "en",
        )
        for i, u in enumerate(urls)
    ]
    pages_df = spark.createDataFrame(rows, PAGES_SCHEMA)
    cfg = CrawlConfig(
        per_host_budget=100,
        max_ticks=3,
        trap_guard=True,
        trap_max_per_pattern=5,
        compact_seen_every=None,
    )
    c = Crawler(spark, pages_df, str(tmp_path / "ck1"), cfg)
    c.run(["https://t.test/"], max_ticks=3)
    seen = [r["url_canon"] for r in c.seen().select("url_canon").collect()]
    cal_seen = [u for u in seen if "/cal/" in u]
    # cap=5 per tick; the calendar family is discovered once (tick 0
    # results) so only 5 calendar URLs ever enter seen
    assert len(cal_seen) == 5
    assert sorted(cal_seen) == [
        f"https://t.test/cal/2024/01/{d:02d}" for d in range(1, 6)
    ]
    # all 3 normal pages enqueued (pattern t.test/page/N/about capped at 5 > 3)
    assert sum("/page/" in u for u in seen) == 3

    # replay equality: a fresh run over the same input yields the same seen set
    c2 = Crawler(spark, pages_df, str(tmp_path / "ck2"), cfg)
    c2.run(["https://t.test/"], max_ticks=3)
    seen2 = [r["url_canon"] for r in c2.seen().select("url_canon").collect()]
    assert sorted(seen) == sorted(seen2)
