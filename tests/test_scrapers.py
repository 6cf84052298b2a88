"""ScrapeResult surface + tree selector precedence — expectations mirror
/root/reference/src/scrapers/scrapers.spec.ts (confidence/metrics) and
tree.ts:55-70 (selector order).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import scrapers
from spider_spark.scrapers import (
    TREE_DEFAULT_SELECTORS,
    col_selector_rank,
    count_expandables,
    scrape_result,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url string, html binary"
    )


def test_selector_precedence_list_verbatim():
    assert TREE_DEFAULT_SELECTORS == [
        "li.directory.collapsed > a",
        "li.collapsed > a",
        "details summary",
        "[data-accordion-trigger]",
        '[data-toggle="collapse"]',
        ".accordion-button",
        ".expand-button",
        '[role="button"][aria-expanded]',
        "button[aria-expanded]",
    ]


def test_count_expandables_precedence_and_seen_set():
    html = (
        '<li class="directory collapsed"><a href="#">2024</a></li>'
        '<details><summary>More</summary><a href="/x">x</a></details>'
        '<button aria-expanded="false">Toggle</button>'
    )
    n, sel, rank = count_expandables(html)
    assert n == 3
    assert sel == "li.directory.collapsed > a" and rank == 0  # most specific wins
    # generic page: nothing expandable
    assert count_expandables("<p>plain</p><a href='/y'>y</a>") == (0, None, None)


def test_basic_scrape_result_confidence_and_metrics(spark):
    """scrapers.spec.ts:70-78: basic → confidence 1, interactionCount 0,
    complete true."""
    out = scrape_result(
        _pages(spark, [("https://a.test/", '<a href="/x">X</a><a href="/y">Y</a>')]),
        scraper_type="basic", spider="simple",
    ).first()
    assert out.strategy.type == "basic" and out.strategy.spider == "simple"
    assert out.strategy.confidence == 1.0
    assert out.metrics.interaction_count == 0 and out.metrics.complete is True
    assert out.metrics.link_count == 2
    assert [l.href for l in out.links] == ["https://a.test/x", "https://a.test/y"]


def test_tree_scrape_result_confidence_09_with_interactions(spark):
    """scrapers.spec.ts:179-182: tree with interactions → spider crawlee,
    interactionCount > 0, confidence 0.9."""
    html = (
        '<div class="accordion-button">Agendas</div>'
        '<div class="accordion-button">Minutes</div>'
        '<a href="/docs/a.pdf">A</a>'
    )
    out = scrape_result(_pages(spark, [("https://t.test/", html)]), scraper_type="tree").first()
    assert out.strategy.type == "tree" and out.strategy.spider == "crawlee"
    assert out.metrics.interaction_count == 2
    assert out.strategy.confidence == 0.9
    assert out.matched_selector == ".accordion-button"


def test_tree_scrape_result_confidence_05_without_interactions(spark):
    """tree.ts:343-348: no interactions → confidence 0.5."""
    out = scrape_result(
        _pages(spark, [("https://t.test/", "<p>static</p>")]), scraper_type="tree"
    ).first()
    assert out.metrics.interaction_count == 0
    assert out.strategy.confidence == 0.5


def test_tree_download_fallback_confidence_08(spark):
    """tree.ts:368-383: download fallback → confidence 0.8, empty content,
    no links/interactions."""
    from spider_spark import udfs

    pages = _pages(spark, [("https://t.test/file.pdf", "<p>ignored</p>")]).withColumn(
        "downloads",
        F.array(
            udfs.materialize_download(
                F.lit("https://t.test/file.pdf"), F.lit("file.pdf"),
                F.lit(b"%PDF-"), F.lit(None).cast("string"),
            )
        ),
    )
    out = scrape_result(pages, scraper_type="tree", downloads_col="downloads").first()
    assert out.strategy.confidence == 0.8
    assert out.content == "" and out.links == []
    assert out.metrics.link_count == 0 and out.metrics.interaction_count == 0
    assert out.downloads[0].filename == "file.pdf"


def test_col_selector_rank_custom_after_defaults(spark):
    df = spark.createDataFrame(
        [("details summary",), (".accordion-button",), (".my-custom",)], "sel string"
    )
    got = [r.rk for r in df.select(col_selector_rank(F.col("sel")).alias("rk")).collect()]
    assert got == [2, 5, 9]  # customs rank after all 9 defaults


def test_strategy_config_map_round_trip(spark):
    out = scrape_result(
        _pages(spark, [("https://a.test/", "<p>x</p>")]),
        scraper_type="tree",
        config={"maxIterations": 10, "clickDelay": 100},
    ).first()
    assert out.strategy.config == {"maxIterations": "10", "clickDelay": "100"}
