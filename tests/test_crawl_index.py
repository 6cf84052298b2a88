"""Crawler.update_index: the standing inverted index maintained
incrementally from the tick ledger. The invariant throughout: after any
sequence of ticks / requeues / resumes, the snapshot equals a FULL
rebuild over each URL's latest indexable capture — and row counts match
too, so a broken anti-join (doubled postings) can't hide in a set
compare."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import synth
from spider_spark.crawler import Crawler
from spider_spark.frontier import CrawlConfig
from spider_spark.operators import index as idx


def _full_rebuild(c):
    res = c.results()
    latest = (
        res.groupBy("url_canon")
        .agg(F.max(F.struct("tick", "seq", "status", "text")).alias("_l"))
        .select(
            F.col("url_canon").alias("doc_id"),
            F.col("_l.status").alias("status"),
            F.col("_l.text").alias("text"),
        )
    )
    docs = latest.where((F.col("status") == 200) & F.col("text").isNotNull()).select(
        "doc_id", "text"
    )
    return idx.postings(docs)


def _snap(df):
    rows = [(r.term, r.doc_id, r.tf) for r in df.collect()]
    return len(rows), set(rows)


def test_update_index_matches_full_rebuild_incrementally(spark, tmp_path):
    pages = synth.generate_pages(spark, 200, n_hosts=8)
    cfg = CrawlConfig(per_host_budget=4, respect_robots=False)
    c = Crawler(spark, pages, str(tmp_path / "ck"), cfg)
    c.run(synth.seed_urls(200, 8), max_ticks=2)

    t1 = c.update_index()
    assert t1 == c.catalog.committed_tick()
    n_got, got = _snap(c.catalog.load_index(spark))
    n_want, want = _snap(_full_rebuild(c))
    assert n_got > 0 and (n_got, got) == (n_want, want)

    # more ticks -> the incremental path (built >= 0), plus a forced
    # refetch so kept-vs-replaced postings actually exercise the anti-join
    requeued = c.results().where(F.col("status") == 200).select("url_canon").limit(5)
    assert c.requeue_urls(requeued) > 0
    c.run(max_ticks=4)
    t2 = c.update_index()
    assert t2 == c.catalog.committed_tick() > t1
    n_got, got = _snap(c.catalog.load_index(spark))
    n_want, want = _snap(_full_rebuild(c))
    assert (n_got, got) == (n_want, want)


def test_update_index_idempotent_and_survives_new_crawler(spark, tmp_path):
    pages = synth.generate_pages(spark, 120, n_hosts=6)
    cfg = CrawlConfig(per_host_budget=4, respect_robots=False)
    c = Crawler(spark, pages, str(tmp_path / "ck2"), cfg)
    c.run(synth.seed_urls(120, 6), max_ticks=2)
    t = c.update_index()
    n1, s1 = _snap(c.catalog.load_index(spark))
    # idempotent: already current -> no-op, same tick back
    assert c.update_index() == t
    # a fresh Crawler on the same checkpoint sees the same snapshot
    c2 = Crawler(spark, pages, str(tmp_path / "ck2"), cfg)
    assert c2.catalog.index_built_at() == t
    n2, s2 = _snap(c2.catalog.load_index(spark))
    assert (n1, s1) == (n2, s2)


def test_update_index_before_any_tick(spark, tmp_path):
    pages = synth.generate_pages(spark, 40, n_hosts=4)
    c = Crawler(spark, pages, str(tmp_path / "ck3"), CrawlConfig(per_host_budget=4))
    assert c.update_index() == -1
    assert c.catalog.load_index(spark).count() == 0
