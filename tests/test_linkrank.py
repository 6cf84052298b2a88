"""Link-analysis family beyond PageRank/OPIC: HITS hubs & authorities,
TrustRank seed-propagated trust, and BFS min-hop crawl depth — each
checked against a literal Python restatement on a hand-sized graph plus
the invariant that defines it (L1 normalization; trust mass confined to
seed-reachable nodes; minimality of depths)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import graph

# a -> b -> c, a -> c, d -> a, e isolated-ish (only as dst)
EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a"), ("c", "e")]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------


def _hits_py(edges, iters):
    nodes = sorted({n for e in edges for n in e})
    hub = {n: 1.0 for n in nodes}
    auth = {n: 0.0 for n in nodes}
    for _ in range(iters):
        auth = {n: sum(hub[s] for s, d in edges if d == n) for n in nodes}
        tot = sum(auth.values())
        auth = {n: v / tot for n, v in auth.items()}
        hub = {n: sum(auth[d] for s, d in edges if s == n) for n in nodes}
        tot = sum(hub.values())
        hub = {n: v / tot for n, v in hub.items()}
    return hub, auth


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_hits_matches_python_reference(spark, edges_df, iters):
    rows = graph.hits(edges_df, iters=iters).collect()
    hub, auth = _hits_py(EDGES, iters)
    assert {r.node for r in rows} == set(hub)
    for r in rows:
        assert r.hub == pytest.approx(hub[r.node], rel=1e-12), r.node
        assert r.auth == pytest.approx(auth[r.node], rel=1e-12), r.node


def test_hits_l1_normalized(spark, edges_df):
    rows = graph.hits(edges_df, iters=2).collect()
    assert sum(r.hub for r in rows) == pytest.approx(1.0, rel=1e-12)
    assert sum(r.auth for r in rows) == pytest.approx(1.0, rel=1e-12)
    # e has no outlinks -> hub 0; d has no inlinks -> auth 0
    by = {r.node: r for r in rows}
    assert by["e"].hub == 0.0
    assert by["d"].auth == 0.0


def test_hits_no_nested_loop_plan(spark, edges_df):
    plan = (
        graph.hits(edges_df, iters=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# TrustRank
# ---------------------------------------------------------------------------


def _trustrank_py(edges, seeds, iters, d=0.85):
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, dd in edges:
        out.setdefault(s, []).append(dd)
    d0 = {n: (1.0 / len(seeds) if n in seeds else 0.0) for n in nodes}
    t = dict(d0)
    for _ in range(iters):
        incoming = {n: 0.0 for n in nodes}
        for s, ds in out.items():
            for dst in ds:
                incoming[dst] += t[s] / len(ds)
        t = {n: (1 - d) * d0[n] + d * incoming[n] for n in nodes}
    return t


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_trustrank_matches_python_reference(spark, edges_df, iters):
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.trust for r in graph.trustrank(edges_df, seeds, iters=iters).collect()}
    want = _trustrank_py(EDGES, {"a"}, iters)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], rel=1e-12, abs=1e-15), n


def test_trustrank_decays_with_distance_and_spam_gets_none(spark, edges_df):
    seeds = spark.createDataFrame([("a",)], "node string")
    t = {r.node: r.trust for r in graph.trustrank(edges_df, seeds, iters=3).collect()}
    # d points AT the seed but is unreachable FROM it -> zero trust
    assert t["d"] == 0.0
    # every seed-reachable node holds positive trust; the seed keeps its
    # (1-d)·d0 teleport floor above the far end of the chain
    assert t["a"] > t["b"] > 0
    assert t["c"] > 0 and t["e"] > 0
    assert t["a"] == pytest.approx(0.15, rel=1e-12)


def test_trustrank_empty_seeds_raises(spark, edges_df):
    seeds = spark.createDataFrame([], "node string")
    with pytest.raises(ValueError):
        graph.trustrank(edges_df, seeds)


# ---------------------------------------------------------------------------
# BFS crawl depth
# ---------------------------------------------------------------------------


def test_bfs_depth_min_hop(spark, edges_df):
    seeds = spark.createDataFrame([("d",)], "node string")
    got = {r.node: r.depth for r in graph.bfs_depth(edges_df, seeds, max_depth=5).collect()}
    # d=0, a=1, b=2, c=2 (via a, not the longer a->b->c), e=3
    assert got == {"d": 0, "a": 1, "b": 2, "c": 2, "e": 3}


def test_bfs_depth_respects_cap_and_multi_seed(spark, edges_df):
    seeds = spark.createDataFrame([("d",), ("b",)], "node string")
    got = {r.node: r.depth for r in graph.bfs_depth(edges_df, seeds, max_depth=1).collect()}
    # both seeds at 0; one wave: d->a, b->c. e stays unreached.
    assert got == {"d": 0, "b": 0, "a": 1, "c": 1}


def test_bfs_depth_cycle_terminates(spark):
    edges = spark.createDataFrame(
        [("x", "y"), ("y", "x")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("x",)], "node string")
    got = {r.node: r.depth for r in graph.bfs_depth(edges, seeds, max_depth=10).collect()}
    assert got == {"x": 0, "y": 1}


# ---------------------------------------------------------------------------
# frontier reranking with the new estimators
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method", ["opic", "trustrank"])
def test_rerank_frontier_opic_and_trustrank(spark, tmp_path, method):
    """rerank_frontier(method=...) swaps priorities in place with the
    same guarantees as the pagerank path: row set preserved, priorities
    inside the reference's 100-999 bands, crawl resumable afterwards."""
    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    pages = synth.generate_pages(spark, 200, n_hosts=8)
    cfg = CrawlConfig(per_host_budget=4, respect_robots=False)
    c = Crawler(spark, pages, str(tmp_path / f"ck_{method}"), cfg)
    c.run(synth.seed_urls(200, 8), max_ticks=2)
    t = c.catalog.committed_tick() + 1
    before = {r.url_canon: r.priority for r in c.catalog.load_frontier(spark, t).collect()}
    n = c.rerank_frontier(method=method)
    after = {r.url_canon: r.priority for r in c.catalog.load_frontier(spark, t).collect()}
    assert n == len(before) == len(after)
    assert set(before) == set(after)
    assert any(after[u] != before[u] for u in after)
    assert all(100 <= p <= 999 for p in after.values())
    stats = c.run(max_ticks=3)
    assert stats and stats[-1].tick >= 2


# ---------------------------------------------------------------------------
# focused crawling + host graph
# ---------------------------------------------------------------------------


def test_relevance_to_targets_max_of_parents(spark):
    edges = spark.createDataFrame(
        [("p1", "t"), ("p2", "t"), ("p2", "u"), ("p3", "v")],
        "src string, dst string",
    )
    scores = spark.createDataFrame(
        [("p1", 3.5), ("p2", 1.0)], "doc_id string, score_r double"
    )
    got = {r.node: r.relevance for r in graph.relevance_to_targets(edges, scores).collect()}
    # t takes the BEST parent (p1); v's only parent p3 is unscored -> absent
    assert got == {"t": 3.5, "u": 1.0}


def test_weighted_pagerank_matches_unweighted_on_unit_weights(spark, edges_df):
    w = edges_df.withColumn("weight", F.lit(1))
    got = {r.node: r.rank for r in graph.weighted_pagerank(w, iters=2).collect()}
    want = {r.node: r.rank for r in graph.pagerank(edges_df, iters=2).collect()}
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], rel=1e-12), n


def test_weighted_pagerank_splits_by_weight(spark):
    # a -> b (weight 3), a -> c (weight 1): b gets 3x c's contribution
    e = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1)], "src string, dst string, weight int"
    )
    got = {r.node: r.rank for r in graph.weighted_pagerank(e, iters=1).collect()}
    assert got["b"] == pytest.approx(0.15 + 0.85 * 0.75, rel=1e-12)
    assert got["c"] == pytest.approx(0.15 + 0.85 * 0.25, rel=1e-12)


def test_host_graph_rollup_and_self_loops(spark):
    e = spark.createDataFrame(
        [
            ("https://A.test/1", "https://b.test/x"),
            ("https://a.test/2", "https://b.test/y"),
            ("https://a.test/3", "https://a.test/4"),  # self-loop
            ("nota url", "https://b.test/z"),  # unparseable src dropped
        ],
        "src string, dst string",
    )
    rows = graph.host_graph(e).collect()
    assert len(rows) == 1
    r = rows[0]
    # case-folded host, loop dropped, weight = 2 underlying links
    assert (r.src_host, r.dst_host, r.weight) == ("a.test", "b.test", 2)
    kept = graph.host_graph(e, drop_self_loops=False).collect()
    assert {(r.src_host, r.dst_host, r.weight) for r in kept} == {
        ("a.test", "b.test", 2),
        ("a.test", "a.test", 1),
    }


def test_contract_edges_through_alias_mapping(spark):
    edges = spark.createDataFrame(
        [("u1", "v"), ("u2", "v"), ("v", "u1"), ("w", "u2"), ("x", "w")],
        "src string, dst string",
    )
    # u1, u2 are aliases of canonical "u"
    mapping = spark.createDataFrame(
        [("u1", "u"), ("u2", "u")], "node string, canonical_url string"
    )
    got = {
        (r.src, r.dst): r.weight
        for r in graph.contract_edges(edges, mapping).collect()
    }
    # u1->v and u2->v collapse to u->v weight 2; v->u1 becomes v->u;
    # w->u2 becomes w->u; x->w untouched (absent from mapping)
    assert got == {("u", "v"): 2, ("v", "u"): 1, ("w", "u"): 1, ("x", "w"): 1}


def test_contract_edges_drops_created_self_loops(spark):
    edges = spark.createDataFrame([("a1", "a2")], "src string, dst string")
    mapping = spark.createDataFrame(
        [("a1", "a"), ("a2", "a")], "node string, canonical_url string"
    )
    assert graph.contract_edges(edges, mapping).count() == 0


def test_degree_stats_and_histogram(spark, edges_df):
    got = {r.node: (r.in_deg, r.out_deg) for r in graph.degree_stats(edges_df).collect()}
    # EDGES: a->b, a->c, b->c, d->a, c->e
    assert got == {
        "a": (1, 2),
        "b": (1, 1),
        "c": (2, 1),
        "d": (0, 1),
        "e": (1, 0),
    }
    hist = {r.bucket: (r.n_nodes, r.min_deg, r.max_deg)
            for r in graph.degree_histogram(edges_df, "in").collect()}
    # in-degrees: 1,1,2,1 -> bucket 0 (deg 1) x3, bucket 1 (deg 2) x1
    assert hist == {0: (3, 1, 1), 1: (1, 2, 2)}
    with pytest.raises(ValueError):
        graph.degree_histogram(edges_df, "sideways")


def test_focus_frontier_boosts_topical_targets(spark, tmp_path):
    """focus_frontier reranks pending URLs by parent BM25 relevance:
    targets linked from pages matching the topic move earlier; the swap
    preserves the row set and bands, and the crawl resumes."""
    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    pages = synth.generate_pages(spark, 200, n_hosts=8)
    cfg = CrawlConfig(per_host_budget=4, respect_robots=False)
    c = Crawler(spark, pages, str(tmp_path / "ck_focus"), cfg)
    c.run(synth.seed_urls(200, 8), max_ticks=2)
    # pick a topic word straight from a crawled page so BM25 has a hit
    sample = (
        c.results()
        .where(F.col("text").isNotNull() & (F.length("text") > 20))
        .select("text")
        .first()
    )
    word = next(w for w in sample.text.lower().split() if w.isalpha())
    t = c.catalog.committed_tick() + 1
    before = {r.url_canon: r.priority for r in c.catalog.load_frontier(spark, t).collect()}
    n = c.focus_frontier(word)
    after = {r.url_canon: r.priority for r in c.catalog.load_frontier(spark, t).collect()}
    assert n == len(before) == len(after)
    assert set(before) == set(after)
    assert all(100 <= p <= 999 for p in after.values())
    # the best-relevance target hits the top of the clamp band
    assert any(p < bp for p, bp in ((after[u], before[u]) for u in after))
    stats = c.run(max_ticks=3)
    assert stats and stats[-1].tick >= 2


def test_rerank_frontier_unknown_method(spark, tmp_path):
    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    pages = synth.generate_pages(spark, 60, n_hosts=4)
    c = Crawler(spark, pages, str(tmp_path / "ck_bad"), CrawlConfig(per_host_budget=4))
    c.run(synth.seed_urls(60, 4), max_ticks=1)
    with pytest.raises(ValueError):
        c.rerank_frontier(method="hits")


# ---------------------------------------------------------------------------
# Rounding-boundary stabilization (round-5 sweep find)
# ---------------------------------------------------------------------------


def test_rank_rounding_partitioning_invariant(spark):
    """Damped-rank values are terminating decimals (0.15/N + 0.85^k/2^m
    families) that can land EXACTLY on x.5e-6 rounding boundaries, where
    summation-order ulp noise used to flip the 6-decimal rounding between
    partitionings (caught by the r5 sf0.1 sweep on trustrank_2iter). The
    entry queries apply a +1e-12 pre-round bias; this pins that the full
    rounded output is byte-identical across shuffle-partition settings."""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    outs = []
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("3", "16"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for q in ("trustrank_2iter", "pagerank_2iter"):
                df = em.queries()[q](spark, sf).toPandas().sort_values("node")
                outs.append((parts, q, df.to_csv(index=False)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    by_q = {}
    for parts, q, csv in outs:
        by_q.setdefault(q, []).append(csv)
    for q, csvs in by_q.items():
        assert csvs[0] == csvs[1], f"{q} rounded output varies with partitioning"
