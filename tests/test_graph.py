"""Graph operators: connected components (dedup clusters), PageRank,
frontier rank-priority folding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_components_chain_and_island(spark):
    # chain 0-1-2 plus island 10-11; labels = min reachable id
    comp = {
        r.node: r.component
        for r in graph.connected_components(_edges(spark, [(0, 1), (1, 2), (10, 11)])).collect()
    }
    assert comp == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}


def test_components_cycle_and_self_loop(spark):
    comp = {
        r.node: r.component
        for r in graph.connected_components(
            _edges(spark, [(5, 6), (6, 7), (7, 5), (9, 9)])
        ).collect()
    }
    assert comp == {5: 5, 6: 5, 7: 5, 9: 9}


def test_components_long_path_converges(spark):
    # a 60-link chain under plain min-propagation needs 60 sweeps; pointer
    # doubling must resolve it within 10
    comp = graph.connected_components(
        _edges(spark, [(i, i + 1) for i in range(60)]), max_iters=10
    )
    assert {r.component for r in comp.collect()} == {0}


def test_components_nonconvergence_raises(spark):
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(_edges(spark, [(i, i + 1) for i in range(30)]), max_iters=1)


def test_dedup_keep_one_per_component(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(5)], "doc_id long, text string")
    comp = graph.connected_components(_edges(spark, [(0, 3), (1, 4)]))
    kept = sorted(
        r.doc_id for r in graph.dedup_keep_one_per_component(docs, comp).collect()
    )
    # components {0,3} and {1,4} keep their min member; 2 untouched
    assert kept == [0, 1, 2]


def test_pagerank_hand_computed(spark):
    # 1→2, 1→3, 2→3, 3→1 ; two iterations from rank=1
    ranks = {
        r.node: r.rank
        for r in graph.pagerank(_edges(spark, [(1, 2), (1, 3), (2, 3), (3, 1)]), iters=2).collect()
    }
    assert ranks[2] == pytest.approx(0.575, abs=1e-9)
    assert ranks[3] == pytest.approx(0.15 + 0.85 * (0.5 + 0.575), abs=1e-9)
    assert ranks[1] == pytest.approx(0.15 + 0.85 * 1.425, abs=1e-9)


def test_pagerank_sink_gets_base_rank(spark):
    # node with no in-edges keeps (1-d); sink accumulates
    ranks = {r.node: r.rank for r in graph.pagerank(_edges(spark, [(1, 2)]), iters=1).collect()}
    assert ranks[1] == pytest.approx(0.15, abs=1e-9)
    assert ranks[2] == pytest.approx(1.0, abs=1e-9)  # 0.15 + 0.85·(1/1)


def test_frontier_rank_priority_clamps_and_preserves(spark):
    frontier = spark.createDataFrame(
        [("https://a.test/x", 200), ("https://a.test/y", 150), ("https://a.test/z", 200)],
        "url_canon string, priority int",
    )
    ranks = spark.createDataFrame(
        [("https://a.test/x", 0.9), ("https://a.test/y", 5.0)], "node string, rank double"
    )
    out = {r.url_canon: r.priority for r in graph.frontier_rank_priority(frontier, ranks).collect()}
    assert out["https://a.test/x"] == 200 - 90   # rank 0.9 → priority 110
    assert out["https://a.test/y"] == 100        # clamped at band floor
    assert out["https://a.test/z"] == 200        # unranked: unchanged


def test_rerank_frontier_composes_with_crawl(spark, tmp_path):
    """PageRank-ordered crawling end-to-end: rerank between ticks boosts
    in-linked frontier rows, stays inside the priority bands, and the
    crawl resumes over the swapped snapshot."""
    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    pages = synth.generate_pages(spark, 200, n_hosts=8)
    cfg = CrawlConfig(per_host_budget=4, respect_robots=False)
    c = Crawler(spark, pages, str(tmp_path / "ck"), cfg)
    c.run(synth.seed_urls(200, 8), max_ticks=2)
    t = c.catalog.committed_tick() + 1
    before = {r.url_canon: r.priority for r in c.catalog.load_frontier(spark, t).collect()}
    n = c.rerank_frontier()
    after = {r.url_canon: r.priority for r in c.catalog.load_frontier(spark, t).collect()}
    assert n == len(before) == len(after)
    assert set(before) == set(after)
    assert any(after[u] != before[u] for u in after)  # in-linked rows boosted
    assert all(100 <= p <= 999 for p in after.values())
    stats = c.run(max_ticks=3)
    assert stats and stats[-1].tick >= 2


def test_replace_frontier_kill_recovery(spark, tmp_path):
    """A kill between replace_frontier's two renames leaves only the
    __bak dir; load_frontier must recover the pre-replace snapshot."""
    import os

    from spider_spark.catalog import CrawlCatalog

    cat = CrawlCatalog(str(tmp_path / "ck2"))
    spark.range(5).select(F.col("id").alias("x")).write.parquet(cat._dir("frontier", 3))
    target = cat._dir("frontier", 3)
    os.rename(target, target + "__bak")
    assert cat.load_frontier(spark, 3).count() == 5


def test_components_cluster_minhash_pairs(spark):
    """Near-dup pairs → clusters: the intended composition with the
    dedup family (pairs share a member ⇒ one cluster)."""
    pairs = _edges(spark, [(100, 101), (101, 102), (200, 201)])
    comp = graph.connected_components(pairs)
    sizes = sorted(
        r.n for r in comp.groupBy("component").agg(F.count("*").alias("n")).collect()
    )
    assert sizes == [2, 3]


# --- anchor-text aggregation -------------------------------------------------


def test_anchor_text_aggregate_counts_and_mode(spark):
    from spider_spark.operators.graph import anchor_text_aggregate

    rows = [
        # dst "a": 3 inlinks from 2 sources; anchors: "home" x2, "start" x1
        ("s1", "a", "Home"),
        ("s1", "a", " home "),
        ("s2", "a", "start"),
        # dst "b": anchors tie 1-1 -> lexicographically smallest wins
        ("s1", "b", "zeta"),
        ("s2", "b", "alpha"),
        # dst "c": only empty/null anchors -> counted as inlinks, no mode
        ("s1", "c", ""),
        ("s2", "c", None),
    ]
    links = spark.createDataFrame(rows, "src string, dst string, anchor string")
    got = {
        r["url"]: r.asDict()
        for r in anchor_text_aggregate(links).collect()
    }
    assert got["a"]["n_inlinks"] == 3 and got["a"]["n_sources"] == 2
    assert got["a"]["n_anchor_variants"] == 2
    assert got["a"]["top_anchor"] == "home" and got["a"]["top_anchor_count"] == 2
    assert got["b"]["top_anchor"] == "alpha" and got["b"]["top_anchor_count"] == 1
    assert got["c"]["n_inlinks"] == 2 and got["c"]["n_anchor_variants"] == 0
    assert got["c"]["top_anchor"] is None and got["c"]["top_anchor_count"] is None


# ---------------------------------------------------------------------------
# canonical_url_clusters
# ---------------------------------------------------------------------------


def test_alias_chain_resolves_to_terminal(spark):
    from spider_spark.operators.graph import canonical_url_clusters

    edges = spark.createDataFrame(
        [
            ("http://a/1", "http://a/2"),   # redirect chain a/1 -> a/2 -> a/final
            ("http://a/2", "http://a/final"),
            ("http://b/x?utm=1", "http://b/x"),  # rel=canonical claim
        ],
        "src string, dst string",
    )
    got = {r.url: r for r in canonical_url_clusters(edges).collect()}
    assert got["http://a/1"].canonical_url == "http://a/final"
    assert got["http://a/2"].canonical_url == "http://a/final"
    assert got["http://a/final"].is_canonical is True
    assert got["http://b/x?utm=1"].canonical_url == "http://b/x"
    # terminal beats lexicographic order: 'http://a/1' < 'http://a/final'
    assert not got["http://a/1"].is_canonical


def test_redirect_cycle_falls_back_to_lexicographic_min(spark):
    from spider_spark.operators.graph import canonical_url_clusters

    edges = spark.createDataFrame(
        [("http://c/y", "http://c/z"), ("http://c/z", "http://c/y")],
        "src string, dst string",
    )
    got = {r.url: r.canonical_url for r in canonical_url_clusters(edges).collect()}
    assert got == {"http://c/y": "http://c/y", "http://c/z": "http://c/y"}


def test_mixed_edge_kinds_merge_one_identity(spark):
    from spider_spark.operators.graph import canonical_url_clusters

    # redirect joins the ?utm alias family to the canonical claim's family
    edges = spark.createDataFrame(
        [
            ("http://d/p?utm=x", "http://d/p"),
            ("http://d/p", "http://d/page"),
            ("http://d/old", "http://d/page"),
        ],
        "src string, dst string",
    )
    rows = canonical_url_clusters(edges).collect()
    assert {r.component for r in rows} == {rows[0].component}
    assert all(r.canonical_url == "http://d/page" for r in rows)
    assert sum(r.is_canonical for r in rows) == 1


def test_outlink_farms_detects_planted_farm(spark):
    from spider_spark.operators.graph import outlink_farms

    rows = []
    # farm: 4 pages on 3 hosts, identical outlink set {t1,t2}
    for i, h in enumerate(["a", "a", "b", "c"]):
        rows += [(f"p{i}", h, "t1"), (f"p{i}", h, "t2")]
    # duplicate edges must not change the DISTINCT set
    rows.append(("p0", "a", "t1"))
    # same-host-only group of 3 (cross_host=False at min_hosts=2... still
    # >= 2? one host) — 3 pages, 1 host
    for i in range(3):
        rows += [(f"q{i}", "z", "u1")]
    # singleton below min_pages
    rows.append(("solo", "s", "v1"))
    edges = spark.createDataFrame(rows, "src string, host string, dst string")
    out = {
        r["first_src"]: (r["n_pages"], r["n_hosts"], r["n_outlinks"], r["cross_host"])
        for r in outlink_farms(edges, host_col="host").collect()
    }
    assert out == {"p0": (4, 3, 2, True), "q0": (3, 1, 1, False)}


def test_outlink_farms_outdegree_guard_and_order_insensitivity(spark):
    from spider_spark.operators.graph import outlink_farms

    rows = [("big", "h", f"d{i}") for i in range(50)]
    # same set presented in different edge orders fingerprints identically
    rows += [("x", "h1", "m"), ("x", "h1", "n"),
             ("y", "h2", "n"), ("y", "h2", "m"),
             ("z", "h3", "m"), ("z", "h3", "n")]
    edges = spark.createDataFrame(rows, "src string, host string, dst string")
    out = outlink_farms(
        edges, host_col="host", max_outdegree=10, min_pages=3
    ).collect()
    assert len(out) == 1
    (farm,) = out
    assert farm["n_pages"] == 3 and farm["first_src"] == "x"
