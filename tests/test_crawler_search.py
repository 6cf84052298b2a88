"""Crawler.search / Crawler.frontier_eta integration — the crawl →
standing index → serve loop, plus postings-only BM25 equivalence."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark import synth
from spider_spark.crawler import Crawler
from spider_spark.frontier import CrawlConfig
from spider_spark.operators import index as ix


def test_postings_only_bm25_equals_docs_form(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["u1", "u2", "u3"],
                "text": [
                    "spark window merge spark",
                    "window data guide",
                    "spark tuning notes",
                ],
            }
        )
    )
    from_docs = {
        (r["doc_id"], r["term"]): r["bm25_r"]
        for r in ix.bm25_scores(docs).collect()
    }
    post = ix.postings(docs)
    from_post = {
        (r["doc_id"], r["term"]): r["bm25_r"]
        for r in ix.bm25_scores_from_postings(post).collect()
    }
    assert from_docs == from_post


def test_crawl_index_search_loop(spark, tmp_path):
    pages = synth.generate_pages(spark, 200, n_hosts=6)
    c = Crawler(
        spark, pages, str(tmp_path / "ckpt"),
        CrawlConfig(per_host_budget=8, store_text=True),
    )
    c.run(synth.seed_urls(200, 6, k=6, per_host=8), max_ticks=2)
    c.update_index()
    # pick a term actually present in the standing index
    post = c.catalog.load_index(spark)
    term = post.groupBy("term").count().orderBy(F.desc("count"), "term").first()[
        "term"
    ]
    hits = c.search(term, k=5).collect()
    assert 1 <= len(hits) <= 5
    assert [r["rank"] for r in hits] == list(range(1, len(hits) + 1))
    # served ranking == exact BM25 over the same postings
    scores = ix.bm25_scores_from_postings(post)
    want = ix.bm25_search(None, term, k=5, scores=scores).collect()
    assert [(r["doc_id"], r["score_r"]) for r in hits] == [
        (r["doc_id"], r["score_r"]) for r in want
    ]
    # every hit is a crawled url
    crawled = {
        r["url_canon"] for r in c.results().filter("status = 200").collect()
    }
    assert {r["doc_id"] for r in hits} <= crawled


def test_frontier_eta_integration(spark, tmp_path):
    pages = synth.generate_pages(spark, 300, n_hosts=5)
    c = Crawler(
        spark, pages, str(tmp_path / "ckpt"),
        CrawlConfig(per_host_budget=4, store_text=False),
    )
    c.run(synth.seed_urls(300, 5, k=5, per_host=4), max_ticks=1)
    eta = {r["host"]: r for r in c.frontier_eta().collect()}
    assert eta, "one tick must leave pending work"
    pending = (
        c.catalog.load_frontier(spark, c.catalog.committed_tick() + 1)
        .groupBy("host")
        .count()
        .collect()
    )
    want = {r["host"]: r["count"] for r in pending}
    for host, row in eta.items():
        assert row["pending"] == want[host]
        assert row["budget"] == 4
        assert row["eta_ticks"] == -(-want[host] // 4)
