"""The seen-filter must be collision-proof: identity is the
(url_hash, url_canon) PAIR, so two distinct URLs sharing a 64-bit hash
(expected ~3 birthday collisions at the north rule's 10^10 URLs) both
survive — the hash only provides shuffle locality.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spider_spark.bloom import build_bloom_shards, filter_unseen_with_bloom


@pytest.fixture()
def colliding(spark):
    """Two distinct canonical URLs forced onto the same 64-bit hash, one of
    them already seen."""
    candidates = spark.createDataFrame(
        [(42, "https://a.test/page1"), (42, "https://b.test/page2")],
        "url_hash long, url_canon string",
    )
    seen = spark.createDataFrame(
        [(42, "https://a.test/page1")], "url_hash long, url_canon string"
    )
    return candidates, seen


def test_exact_anti_join_survives_hash_collision(colliding):
    candidates, seen = colliding
    out = filter_unseen_with_bloom(candidates, seen, None)
    assert [r.url_canon for r in out.collect()] == ["https://b.test/page2"]


def test_bloom_path_survives_hash_collision(colliding):
    candidates, seen = colliding
    bloom = build_bloom_shards(seen, num_shards=4, bits_per_shard=1 << 12)
    out = filter_unseen_with_bloom(
        candidates, seen, bloom, num_shards=4, bits_per_shard=1 << 12
    )
    # the colliding new URL is a bloom maybe-hit but survives the exact check
    assert [r.url_canon for r in out.collect()] == ["https://b.test/page2"]


def test_crawl_tick_seen_filter_with_forced_collisions(spark, tmp_ckpt, monkeypatch):
    """End-to-end: monkeypatch col_url_hash to a constant so EVERY URL
    collides; the crawl must still fetch each distinct URL exactly once."""
    from spider_spark import synth, udfs
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    monkeypatch.setattr(udfs, "col_url_hash", lambda col: F.lit(7).cast("long"))

    pages = synth.generate_pages(spark, 60, n_hosts=3)
    crawler = Crawler(spark, pages, tmp_ckpt, CrawlConfig(per_host_budget=4))
    crawler.run(synth.seed_urls(60, 3), max_ticks=3)
    res = crawler.results().filter(F.col("status") == 200)
    fetched = [r.url_canon for r in res.select("url_canon").collect()]
    assert len(fetched) == len(set(fetched)) > 0  # no refetch, despite all-collide
    seen = crawler.seen()
    seen_urls = [r.url_canon for r in seen.select("url_canon").collect()]
    assert len(seen_urls) == len(set(seen_urls))
