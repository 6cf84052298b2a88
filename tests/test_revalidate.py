"""Conditional revalidation (HTTP 304 analog): unchanged pages are NOT
requeued; changed pages are refetched exactly once and the results ledger
records a new capture with a different content fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import synth
from spider_spark.crawler import Crawler
from spider_spark.frontier import CrawlConfig


def _crawl(spark, tmp_path, name="ckpt"):
    pages = synth.generate_pages(spark, 200, n_hosts=6)
    seeds = synth.seed_urls(200, 6)
    c = Crawler(spark, pages, str(tmp_path / name), CrawlConfig(per_host_budget=16))
    stats = c.run(seeds, max_ticks=30)
    assert stats[-1].fetched == 0  # drained
    return c, pages


def test_content_fp_recorded_for_ok_rows_only(spark, tmp_path):
    c, _ = _crawl(spark, tmp_path)
    res = c.results()
    assert res.filter("status = 200 AND content_fp IS NULL").count() == 0
    assert res.filter("status != 200 AND content_fp IS NOT NULL").count() == 0


def test_revalidate_unchanged_requeues_nothing(spark, tmp_path):
    c, _ = _crawl(spark, tmp_path)
    some = c.results().filter("status = 200").select("url_canon").limit(20)
    assert c.revalidate_urls(some) == 0


def test_revalidate_changed_page_refetches_exactly_once(spark, tmp_path):
    c, pages = _crawl(spark, tmp_path)
    url = (
        c.results()
        .filter("status = 200")
        .orderBy("url_canon")
        .limit(1)
        .collect()[0]
        .url_canon
    )
    # the "site" updates one page: flip its html bytes
    mutated = pages.withColumn(
        "html",
        F.when(
            F.col("url") == url, F.concat(F.col("html"), F.lit(b"<!--v2-->"))
        ).otherwise(F.col("html")),
    )
    c2 = Crawler(
        spark, mutated, str(tmp_path / "ckpt"), CrawlConfig(per_host_budget=16)
    )
    probe = c2.results().filter("status = 200").select("url_canon").limit(20)
    # the probe set includes unchanged URLs; only the mutated one requeues
    n = c2.revalidate_urls(probe.unionByName(spark.createDataFrame([(url,)], "url_canon string")).distinct())
    assert n == 1
    c2.run(max_ticks=c2.catalog.committed_tick() + 3)
    caps = (
        c2.results()
        .filter(F.col("url_canon") == url)
        .select("tick", "content_fp")
        .collect()
    )
    assert len(caps) == 2
    fps = {r.content_fp for r in caps}
    assert len(fps) == 2 and None not in fps
    # everything else fetched exactly once
    dup = (
        c2.results()
        .filter(F.col("url_canon") != url)
        .groupBy("url_canon")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0
    # a second revalidation after the refetch sees the new fingerprint
    assert c2.revalidate_urls(spark.createDataFrame([(url,)], "url_canon string")) == 0


def test_revalidate_errored_url_requeues(spark, tmp_path):
    """A URL in seen with no OK capture (e.g. fetched as 404) has no
    fingerprint — revalidation treats it as changed."""
    c, pages = _crawl(spark, tmp_path)
    missed = c.results().filter("status = 404").select("url_canon").limit(1).collect()
    if not missed:  # corpus happened to have no dead links
        return
    url = missed[0].url_canon
    n = c.revalidate_urls(spark.createDataFrame([(url,)], "url_canon string"))
    # requeued only if the page store can actually serve it now — for a
    # 404 the store has no row, so the probe join drops it: 0 requeued
    assert n == 0
