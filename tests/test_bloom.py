"""Sharded bloom seen-filter: exactness of the accelerated path."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.bloom import build_bloom_shards, filter_unseen_with_bloom, split_by_bloom


def _hash_df(spark, name, lo, hi):
    return spark.range(lo, hi).select(
        F.xxhash64(F.concat(F.lit(name), F.col("id"))).alias("url_hash"),
        F.concat(F.lit("u"), F.col("id")).alias("url_canon"),
    )


def test_bloom_no_false_negatives(spark):
    seen = _hash_df(spark, "x", 0, 3000)
    bloom = build_bloom_shards(seen, num_shards=8, bits_per_shard=1 << 16)
    assert bloom.count() <= 8
    _, maybe = split_by_bloom(seen, bloom, num_shards=8, bits_per_shard=1 << 16)
    # every truly-seen hash must probe as maybe-seen
    assert maybe.count() == 3000


def test_bloom_accelerated_filter_is_exact(spark):
    seen = _hash_df(spark, "x", 0, 2000)
    candidates = _hash_df(spark, "x", 1000, 4000)  # half seen, half new
    bloom = build_bloom_shards(seen, num_shards=8, bits_per_shard=1 << 16)
    exact = candidates.join(seen.select("url_hash"), "url_hash", "left_anti")
    fast = filter_unseen_with_bloom(candidates, seen, bloom, num_shards=8, bits_per_shard=1 << 16)
    assert {r.url_canon for r in fast.collect()} == {r.url_canon for r in exact.collect()}
    assert fast.count() == 2000


def test_bloom_prefilter_reduces_exact_checks(spark):
    seen = _hash_df(spark, "x", 0, 2000)
    candidates = _hash_df(spark, "x", 1900, 6000)  # mostly new
    bloom = build_bloom_shards(seen, num_shards=8, bits_per_shard=1 << 18)
    new, maybe = split_by_bloom(candidates, bloom, num_shards=8, bits_per_shard=1 << 18)
    # the exact anti-join residue should be close to the truly-seen overlap
    # (100) — false positives only add a small margin at this load factor
    assert maybe.count() < 400
    assert new.count() > 3600


def test_crawl_with_bloom_identical_to_exact(spark, tmp_path):
    """use_bloom=True must produce the exact same url_seen set and crawl
    order as the plain anti-join (bloom FPs only cost extra exact checks)."""
    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    pages = synth.generate_pages(spark, 300, n_hosts=8)
    seeds = synth.seed_urls(300, 8)
    a = Crawler(spark, pages, str(tmp_path / "a"), CrawlConfig(per_host_budget=4))
    a.run(seeds, max_ticks=4)
    b = Crawler(
        spark, pages, str(tmp_path / "b"),
        CrawlConfig(per_host_budget=4, use_bloom=True, bloom_shards=8, bloom_bits_per_shard=1 << 14),
    )
    b.run(seeds, max_ticks=4)
    sa = sorted(r.url_canon for r in a.seen().collect())
    sb = sorted(r.url_canon for r in b.seen().collect())
    assert sa == sb
    oa = [(r.tick, r.url_canon) for r in a.crawl_order().collect()]
    ob = [(r.tick, r.url_canon) for r in b.crawl_order().collect()]
    assert oa == ob


def test_bloom_enabled_on_non_bloom_checkpoint_resume(spark, tmp_path):
    """ADVICE r01: resuming a checkpoint created with use_bloom=False under
    use_bloom=True must rebuild the bloom from the FULL seen set — a
    delta-only bloom lets seen URLs skip the exact anti-join and be
    re-enqueued (duplicate fetches)."""
    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    pages = synth.generate_pages(spark, 300, n_hosts=8)
    seeds = synth.seed_urls(300, 8)
    ckpt = str(tmp_path / "mixed")
    # ticks 0-1 without bloom
    a = Crawler(spark, pages, ckpt, CrawlConfig(per_host_budget=4))
    a.run(seeds, max_ticks=2)
    # resume with bloom on
    b = Crawler(
        spark, pages, ckpt,
        CrawlConfig(per_host_budget=4, use_bloom=True, bloom_shards=8, bloom_bits_per_shard=1 << 14),
    )
    b.run(max_ticks=5)
    # reference: uninterrupted non-bloom run
    c = Crawler(spark, pages, str(tmp_path / "ref"), CrawlConfig(per_host_budget=4))
    c.run(seeds, max_ticks=5)
    # no URL fetched twice, and the final seen set matches the reference run
    dup = b.results().groupBy("url_canon").count().filter("count > 1").count()
    assert dup == 0
    assert sorted(r.url_canon for r in b.seen().collect()) == sorted(
        r.url_canon for r in c.seen().collect()
    )
