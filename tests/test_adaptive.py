"""Adaptive per-host politeness (operators/adaptive.py): AIMD budget
control — one-step and whole-ledger forms agree, overrides tighten (never
loosen) politeness, the crawler carries the state crash-safely."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import synth
from spider_spark.crawler import Crawler
from spider_spark.frontier import CrawlConfig, politeness_tag, seeds_to_frontier
from spider_spark.operators import adaptive


def _results(spark, rows):
    """rows: (host, tick, status) triples → minimal results-ledger frame."""
    return spark.createDataFrame(rows, ["host", "tick", "status"])


def test_step_halves_on_errors_grows_when_healthy(spark):
    prev = spark.createDataFrame([("a", 8), ("c", 3)], ["host", "budget"])
    tick = _results(
        spark,
        [("a", 1, 200), ("a", 1, 599), ("a", 1, 599), ("a", 1, 200),  # 50% err
         ("b", 1, 200), ("b", 1, 200)],                               # new, healthy
    )
    got = {r["host"]: r["budget"]
           for r in adaptive.step_host_budgets(prev, tick, base_budget=8).collect()}
    assert got["a"] == 4          # 8 // 2
    assert got["b"] == 8          # enters at base, healthy, capped at base
    assert got["c"] == 3          # silent → unchanged


def test_step_floor_and_recovery_cap(spark):
    prev = spark.createDataFrame([("a", 1), ("b", 8)], ["host", "budget"])
    tick = _results(spark, [("a", 2, 599), ("b", 2, 200)])
    got = {r["host"]: r["budget"]
           for r in adaptive.step_host_budgets(prev, tick, base_budget=8).collect()}
    assert got["a"] == 1          # min floor holds under repeated halving
    assert got["b"] == 8          # additive increase never exceeds the cap
    prev2 = spark.createDataFrame([("b", 3)], ["host", "budget"])
    got2 = {r["host"]: r["budget"]
            for r in adaptive.step_host_budgets(prev2, tick, base_budget=8).collect()}
    assert got2["b"] == 4         # 3 + 1, below the cap


def test_451_rows_are_not_observations(spark):
    prev = spark.createDataFrame([("a", 6)], ["host", "budget"])
    tick = _results(spark, [("a", 1, 451), ("a", 1, 451)])
    got = adaptive.step_host_budgets(prev, tick, base_budget=8).collect()
    assert {r["host"]: r["budget"] for r in got} == {"a": 6}  # unchanged


def test_batch_fold_equals_iterated_steps(spark):
    rows = []
    for t in range(5):
        for h in range(6):
            host = f"h{h}"
            for k in range(3 + (h * t) % 4):
                status = 599 if (h + t + k) % 3 == 0 else 200
                rows.append((host, t, status))
    ledger = _results(spark, rows)
    fold = {r["host"]: r["next_budget"]
            for r in adaptive.adaptive_host_budgets(ledger, base_budget=8).collect()}
    state = None
    for t in range(5):
        state = adaptive.step_host_budgets(
            state, ledger.filter(F.col("tick") == t), base_budget=8
        )
    iterated = {r["host"]: r["budget"] for r in state.collect()}
    assert fold == iterated


def test_overrides_tighten_never_loosen(spark):
    cfg = CrawlConfig(per_host_budget=8, respect_robots=False)
    urls = [f"https://one.test/p{i}" for i in range(12)]
    frontier = seeds_to_frontier(spark, urls, cfg)
    tight = spark.createDataFrame([("one.test", 2)], ["host", "budget"])
    loose = spark.createDataFrame([("one.test", 50)], ["host", "budget"])
    n_tight = (
        politeness_tag(frontier, cfg, None, budget_overrides=tight)
        .filter("is_selected").count()
    )
    n_loose = (
        politeness_tag(frontier, cfg, None, budget_overrides=loose)
        .filter("is_selected").count()
    )
    n_unlisted = (
        politeness_tag(
            frontier, cfg, None,
            budget_overrides=spark.createDataFrame([("other.test", 1)], ["host", "budget"]),
        ).filter("is_selected").count()
    )
    assert n_tight == 2
    assert n_loose == 8   # least(static, override): override can't loosen
    assert n_unlisted == 8


def _crawl(spark, path, ticks):
    pages = synth.generate_pages(spark, 300, n_hosts=8)
    cfg = CrawlConfig(
        per_host_budget=4,
        max_ticks=ticks,
        adaptive_politeness=True,
        adaptive_error_min_status=400,  # treat dead links as distress
        respect_robots=False,
    )
    c = Crawler(spark, pages, path, cfg)
    c.run(synth.seed_urls(300, 8), max_ticks=ticks)
    return c


def test_crawler_carries_state_and_resumes_identically(spark, tmp_path):
    straight = _crawl(spark, str(tmp_path / "a"), 3)
    # killed-and-resumed run: new Crawler objects on the same checkpoint
    _crawl(spark, str(tmp_path / "b"), 2)
    pages = synth.generate_pages(spark, 300, n_hosts=8)
    cfg = CrawlConfig(
        per_host_budget=4, adaptive_politeness=True,
        adaptive_error_min_status=400, respect_robots=False,
    )
    resumed = Crawler(spark, pages, str(tmp_path / "b"), cfg)
    resumed.run(max_ticks=3)

    def state(c, tick):
        df = c.catalog.load_host_state(spark, tick)
        return sorted((r["host"], r["budget"]) for r in df.collect())

    s_a, s_b = state(straight, 3), state(resumed, 3)
    assert s_a == s_b and len(s_a) > 0
    # adaptive state must only ever tighten below the static budget
    assert all(b <= 4 for _, b in s_a)
    # at least one host showed distress on this corpus (dead links exist)
    assert any(b < 4 for _, b in s_a), s_a
