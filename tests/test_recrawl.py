"""Recrawl policies: requeue (immediate refetch) and forget (organic
rediscovery via seen-set + accelerator deletion).

The forget path is what the cuckoo accelerator's deletion exists for —
a bloom must be rebuilt from the kept set, a cuckoo is pruned in place —
and both must leave the crawl's no-duplicate invariant intact for every
URL that was NOT recrawled.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark import synth
from spider_spark.crawler import Crawler
from spider_spark.frontier import CrawlConfig


def _crawl_to_exhaustion(spark, tmp_path, cfg):
    """Crawl until the frontier is truly drained (2-empty-tick exit), so a
    requeued URL is guaranteed to win its host's politeness budget on the
    next tick."""
    pages = synth.generate_pages(spark, 200, n_hosts=6)
    seeds = synth.seed_urls(200, 6)
    c = Crawler(spark, pages, str(tmp_path / "ckpt"), cfg)
    stats = c.run(seeds, max_ticks=30)
    assert stats[-1].fetched == 0  # drained, not max_ticks-bounded
    return c


def _pick_parent_and_target(c):
    """A (parent, target) edge from the crawl's own link graph: parent was
    fetched OK and links to target, which was also fetched."""
    edges = (
        c.results()
        .filter("status = 200")
        .select(F.col("url_canon").alias("parent"), F.explode("links").alias("l"))
        .select("parent", F.col("l.href_canon").alias("target"))
        .filter(F.col("target").isNotNull() & (F.col("target") != F.col("parent")))
    )
    fetched = c.results().filter("status = 200").select(F.col("url_canon").alias("target"))
    row = edges.join(fetched, "target").limit(1).collect()[0]
    return row.parent, row.target


def test_requeue_fetches_again_exactly_once(spark, tmp_path):
    c = _crawl_to_exhaustion(spark, tmp_path, CrawlConfig(per_host_budget=16))
    url = c.results().filter("status = 200").limit(1).collect()[0].url_canon
    n = c.requeue_urls(spark.createDataFrame([(url,)], "url_canon string"))
    assert n == 1
    # requeueing the same URL again is a no-op while it waits in the frontier
    assert c.requeue_urls(spark.createDataFrame([(url,)], "url_canon string")) == 0
    c.run(max_ticks=c.catalog.committed_tick() + 3)
    counts = {r.url_canon: r.n for r in c.results().groupBy("url_canon").agg(F.count("*").alias("n")).collect()}
    assert counts[url] == 2
    assert all(v == 1 for u, v in counts.items() if u != url)


@pytest.mark.parametrize("accel", [None, "bloom", "cuckoo"])
def test_forget_then_organic_rediscovery(spark, tmp_path, accel):
    cfg = CrawlConfig(
        per_host_budget=16,
        use_bloom=accel == "bloom",
        bloom_shards=8,
        bloom_bits_per_shard=1 << 14,
        use_cuckoo=accel == "cuckoo",
        cuckoo_shards=8,
        cuckoo_buckets_per_shard=1 << 10,
    )
    c = _crawl_to_exhaustion(spark, tmp_path, cfg)
    parent, target = _pick_parent_and_target(c)
    seen_before = {r.url_canon for r in c.seen().collect()}
    assert target in seen_before

    c.forget_urls(spark.createDataFrame([(target,)], "url_canon string"))
    assert target not in {r.url_canon for r in c.seen().collect()}

    # refresh the parent; its link to the forgotten target must re-enqueue it
    assert c.requeue_urls(spark.createDataFrame([(parent,)], "url_canon string")) == 1
    c.run(max_ticks=c.catalog.committed_tick() + 3)

    counts = {
        r.url_canon: r.n
        for r in c.results().groupBy("url_canon").agg(F.count("*").alias("n")).collect()
    }
    assert counts[parent] == 2  # requeued
    assert counts[target] == 2  # organically rediscovered after forget
    assert all(v == 1 for u, v in counts.items() if u not in (parent, target))
    # the target is seen again, and nothing else was lost by the rewrite
    assert {r.url_canon for r in c.seen().collect()} == seen_before


def test_forget_survives_resume_across_compaction(spark, tmp_path):
    """forget_urls rewrites the seen set at the same tick as an existing
    compaction snapshot — the generation-suffixed dir must keep the swap
    safe and a subsequent resume consistent."""
    cfg = CrawlConfig(per_host_budget=16, compact_seen_every=2)
    c = _crawl_to_exhaustion(spark, tmp_path, cfg)
    parent, target = _pick_parent_and_target(c)
    c.forget_urls(spark.createDataFrame([(target,)], "url_canon string"))
    # forgetting twice is idempotent
    c.forget_urls(spark.createDataFrame([(target,)], "url_canon string"))
    assert target not in {r.url_canon for r in c.seen().collect()}
    c.requeue_urls(spark.createDataFrame([(parent,)], "url_canon string"))
    c.run(max_ticks=c.catalog.committed_tick() + 3)
    dup = (
        c.results().groupBy("url_canon").count()
        .filter(~F.col("url_canon").isin([parent, target]))
        .filter("count > 1")
        .count()
    )
    assert dup == 0


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_verdicts(spark):
    from spider_spark.operators.recrawl import snapshot_diff, snapshot_diff_rollup

    old = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("d", None), ("e", 5)],
        "url_canon string, content_fp long",
    )
    new = spark.createDataFrame(
        [("a", 1), ("b", 99), ("d", None), ("f", 6), ("e", None)],
        "url_canon string, content_fp long",
    )
    got = {r.url_canon: r.verdict for r in snapshot_diff(old, new).collect()}
    assert got == {
        "a": "unchanged",
        "b": "changed",
        "c": "removed",
        "d": "unchanged",  # null == null via eqNullSafe (304-style rows)
        "e": "changed",    # value -> null IS a change
        "f": "added",
    }
    roll = {r.verdict: r.n for r in snapshot_diff_rollup(
        snapshot_diff(old, new)
    ).collect()}
    assert roll == {"unchanged": 2, "changed": 2, "removed": 1, "added": 1}


def test_snapshot_diff_single_join_plan(spark):
    from spider_spark.operators.recrawl import snapshot_diff

    old = spark.createDataFrame([("a", 1)], "url_canon string, content_fp long")
    new = spark.createDataFrame([("a", 1)], "url_canon string, content_fp long")
    plan = (
        snapshot_diff(old, new)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1
    assert "BroadcastNestedLoopJoin" not in plan
