"""Frontier priority aging (anti-starvation): deferred URLs gain effective
priority each tick they wait, so low-priority bands can't starve forever
behind a steady stream of fresh high-priority arrivals."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import synth
from spider_spark.crawler import Crawler
from spider_spark.frontier import FRONTIER_SCHEMA, CrawlConfig, politeness_tag


def _frontier(spark, rows):
    """rows: (url, priority, discovered_tick) — host fixed, seq = row order."""
    data = [
        (u, hash(u) % (1 << 60), "one.test", p, dt, f"{i:012x}")
        for i, (u, p, dt) in enumerate(rows)
    ]
    return spark.createDataFrame(data, FRONTIER_SCHEMA)


def _selected(spark, rows, cfg, tick):
    tagged = politeness_tag(_frontier(spark, rows), cfg, None, tick=tick)
    return {r["url_canon"] for r in tagged.filter("is_selected").collect()}


def test_aging_off_is_strict_band_order(spark):
    cfg = CrawlConfig(per_host_budget=2, respect_robots=False)
    rows = [
        ("https://one.test/old-low", 200, 0),
        ("https://one.test/fresh-a", 100, 9),
        ("https://one.test/fresh-b", 100, 9),
    ]
    # no aging: fresh priority-100 rows always win, however old the 200 is
    assert _selected(spark, rows, cfg, tick=9) == {
        "https://one.test/fresh-a", "https://one.test/fresh-b",
    }


def test_aging_promotes_starved_url(spark):
    cfg = CrawlConfig(
        per_host_budget=2, respect_robots=False, priority_aging_per_tick=10
    )
    rows = [
        ("https://one.test/old-low", 200, 0),
        ("https://one.test/fresh-a", 100, 9),
        ("https://one.test/fresh-b", 100, 9),
    ]
    # tick 9: eff(old) = 200 - 90 = 110 > eff(fresh) = 100 → still deferred
    assert "https://one.test/old-low" not in _selected(spark, rows, cfg, tick=9)
    # tick 11: eff(old) = 200 - 110 → clamped path 90 < 100 → promoted
    rows11 = [
        ("https://one.test/old-low", 200, 0),
        ("https://one.test/fresh-a", 100, 11),
        ("https://one.test/fresh-b", 100, 11),
    ]
    sel = _selected(spark, rows11, cfg, tick=11)
    assert "https://one.test/old-low" in sel and len(sel) == 2


def test_aging_clamps_at_zero(spark):
    cfg = CrawlConfig(
        per_host_budget=1, respect_robots=False, priority_aging_per_tick=10
    )
    # both URLs age far past 0: clamped equal, discovered_tick then seq break
    # the tie — the older URL wins
    rows = [
        ("https://one.test/ancient-b", 150, 1),
        ("https://one.test/ancient-a", 200, 0),
    ]
    assert _selected(spark, rows, cfg, tick=100) == {"https://one.test/ancient-a"}


def test_crawl_runs_and_resumes_with_aging(spark, tmp_path):
    pages = synth.generate_pages(spark, 200, n_hosts=6)
    cfg = CrawlConfig(
        per_host_budget=3, respect_robots=False, priority_aging_per_tick=5
    )
    straight = Crawler(spark, pages, str(tmp_path / "a"), cfg)
    s = straight.run(synth.seed_urls(200, 6), max_ticks=3)
    assert sum(st.fetched for st in s) > 0
    Crawler(spark, pages, str(tmp_path / "b"), cfg).run(
        synth.seed_urls(200, 6), max_ticks=2
    )
    resumed = Crawler(spark, pages, str(tmp_path / "b"), cfg)
    resumed.run(max_ticks=3)
    a = straight.results().select("url_canon", "status", "tick")
    b = resumed.results().select("url_canon", "status", "tick")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
