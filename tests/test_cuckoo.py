"""Sharded cuckoo seen-filter: exactness, merge, and deletion.

Same contract as the bloom accelerator (test_bloom.py) plus the cuckoo's
differentiator — deletion — which a bloom cannot do (SURVEY.md §2.5 names
the accelerator "bloom/cuckoo").
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.cuckoo import (
    build_cuckoo_shards,
    delete_from_cuckoo,
    filter_unseen_with_cuckoo,
    merge_cuckoo_shards,
    split_by_cuckoo,
)


def _hash_df(spark, name, lo, hi):
    return spark.range(lo, hi).select(
        F.xxhash64(F.concat(F.lit(name), F.col("id"))).alias("url_hash"),
        F.concat(F.lit("u"), F.col("id")).alias("url_canon"),
    )


def test_cuckoo_no_false_negatives(spark):
    seen = _hash_df(spark, "x", 0, 3000)
    cuckoo = build_cuckoo_shards(seen, num_shards=8, buckets_per_shard=1 << 10)
    assert cuckoo.count() <= 8
    _, maybe = split_by_cuckoo(seen, cuckoo, num_shards=8)
    assert maybe.count() == 3000


def test_cuckoo_accelerated_filter_is_exact(spark):
    seen = _hash_df(spark, "x", 0, 2000)
    candidates = _hash_df(spark, "x", 1000, 4000)  # half seen, half new
    cuckoo = build_cuckoo_shards(seen, num_shards=8, buckets_per_shard=1 << 10)
    exact = candidates.join(seen.select("url_hash"), "url_hash", "left_anti")
    fast = filter_unseen_with_cuckoo(candidates, seen, cuckoo, num_shards=8)
    assert {r.url_canon for r in fast.collect()} == {r.url_canon for r in exact.collect()}
    assert fast.count() == 2000


def test_cuckoo_prefilter_reduces_exact_checks(spark):
    seen = _hash_df(spark, "x", 0, 2000)
    candidates = _hash_df(spark, "x", 1900, 6000)  # mostly new
    cuckoo = build_cuckoo_shards(seen, num_shards=8, buckets_per_shard=1 << 12)
    new, maybe = split_by_cuckoo(candidates, cuckoo, num_shards=8)
    # the exact residue should be close to the truly-seen overlap (100):
    # 16-bit fingerprints make cuckoo FPs rarer than the equivalent bloom
    assert maybe.count() < 200
    assert new.count() > 3900


def test_cuckoo_overflow_keeps_exactness(spark):
    """A shard overfilled far past capacity (2 buckets × 4 slots vs 3000
    items) must still never produce a false negative — the overflow list
    catches what eviction cannot place."""
    seen = _hash_df(spark, "x", 0, 3000)
    cuckoo = build_cuckoo_shards(seen, num_shards=2, buckets_per_shard=2)
    _, maybe = split_by_cuckoo(seen, cuckoo, num_shards=2)
    assert maybe.count() == 3000


def test_cuckoo_merge_is_union(spark):
    a = _hash_df(spark, "x", 0, 1500)
    b = _hash_df(spark, "x", 1500, 3000)
    merged = merge_cuckoo_shards(
        build_cuckoo_shards(a, num_shards=4, buckets_per_shard=1 << 10),
        build_cuckoo_shards(b, num_shards=4, buckets_per_shard=1 << 10),
    )
    both = _hash_df(spark, "x", 0, 3000)
    _, maybe = split_by_cuckoo(both, merged, num_shards=4)
    assert maybe.count() == 3000  # no member of either side lost by the fold
    fresh = _hash_df(spark, "y", 0, 2000)
    new, _ = split_by_cuckoo(fresh, merged, num_shards=4)
    assert new.count() > 1900  # still filters (FP rate did not collapse)


def test_cuckoo_delete_makes_urls_refetchable(spark):
    """The bloom cannot do this: evict URLs from the accelerator so a
    recrawl policy re-fetches them, without disturbing other members."""
    seen = _hash_df(spark, "x", 0, 2000)
    cuckoo = build_cuckoo_shards(seen, num_shards=4, buckets_per_shard=1 << 10)
    recrawl = _hash_df(spark, "x", 0, 300).select("url_hash")
    pruned = delete_from_cuckoo(cuckoo, recrawl, num_shards=4)
    deleted, kept = _hash_df(spark, "x", 0, 300), _hash_df(spark, "x", 300, 2000)
    new_d, _ = split_by_cuckoo(deleted, pruned, num_shards=4)
    _, maybe_k = split_by_cuckoo(kept, pruned, num_shards=4)
    # deleted URLs now probe definitely-new (no fp collisions at this
    # density: 1024 buckets × 16-bit fps vs 2000 items)
    assert new_d.count() == 300
    # every still-seen URL remains maybe-seen (no collateral false negative)
    assert maybe_k.count() == 1700


def test_crawl_with_cuckoo_identical_to_exact(spark, tmp_path):
    """use_cuckoo=True must produce the exact same url_seen set and crawl
    order as the plain anti-join (cuckoo FPs only cost extra exact checks)."""
    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    pages = synth.generate_pages(spark, 300, n_hosts=8)
    seeds = synth.seed_urls(300, 8)
    a = Crawler(spark, pages, str(tmp_path / "a"), CrawlConfig(per_host_budget=4))
    a.run(seeds, max_ticks=4)
    b = Crawler(
        spark, pages, str(tmp_path / "b"),
        CrawlConfig(per_host_budget=4, use_cuckoo=True, cuckoo_shards=8,
                    cuckoo_buckets_per_shard=1 << 10),
    )
    b.run(seeds, max_ticks=4)
    assert sorted(r.url_canon for r in a.seen().collect()) == sorted(
        r.url_canon for r in b.seen().collect()
    )
    oa = [(r.tick, r.url_canon) for r in a.crawl_order().collect()]
    ob = [(r.tick, r.url_canon) for r in b.crawl_order().collect()]
    assert oa == ob


def test_cuckoo_enabled_on_plain_checkpoint_resume(spark, tmp_path):
    """Resuming a filter-less checkpoint under use_cuckoo=True must rebuild
    the filter from the FULL seen set (same invariant as the bloom resume:
    a delta-only filter re-enqueues seen URLs)."""
    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    pages = synth.generate_pages(spark, 300, n_hosts=8)
    seeds = synth.seed_urls(300, 8)
    ckpt = str(tmp_path / "mixed")
    a = Crawler(spark, pages, ckpt, CrawlConfig(per_host_budget=4))
    a.run(seeds, max_ticks=2)
    b = Crawler(
        spark, pages, ckpt,
        CrawlConfig(per_host_budget=4, use_cuckoo=True, cuckoo_shards=8,
                    cuckoo_buckets_per_shard=1 << 10),
    )
    b.run(max_ticks=5)
    c = Crawler(spark, pages, str(tmp_path / "ref"), CrawlConfig(per_host_budget=4))
    c.run(seeds, max_ticks=5)
    dup = b.results().groupBy("url_canon").count().filter("count > 1").count()
    assert dup == 0
    assert sorted(r.url_canon for r in b.seen().collect()) == sorted(
        r.url_canon for r in c.seen().collect()
    )


def test_bloom_and_cuckoo_mutually_exclusive(spark, tmp_path):
    import pytest

    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    pages = synth.generate_pages(spark, 10, n_hosts=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        Crawler(
            spark, pages, str(tmp_path / "x"),
            CrawlConfig(use_bloom=True, use_cuckoo=True),
        )
