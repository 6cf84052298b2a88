"""SALSA bipartite-walk link analysis (graph.salsa)."""

from __future__ import annotations

from collections import defaultdict

from spider_spark.operators import graph as gr


def _brute(edges, iters):
    outd = defaultdict(int)
    ind = defaultdict(int)
    for s, d in edges:
        outd[s] += 1
        ind[d] += 1
    nodes = sorted({n for e in edges for n in e})
    hub = {n: 1.0 for n in nodes}
    auth = {}
    for _ in range(iters):
        raw = defaultdict(float)
        for s, d in edges:
            raw[d] += hub[s] / outd[s]
        tot = sum(raw.values())
        auth = {n: raw.get(n, 0.0) / tot for n in nodes}
        raw = defaultdict(float)
        for s, d in edges:
            raw[s] += auth[d] / ind[d]
        tot = sum(raw.values())
        hub = {n: raw.get(n, 0.0) / tot for n in nodes}
    return hub, auth


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


GRAPH = [
    (0, 1), (0, 2), (1, 2), (2, 1), (3, 1), (3, 4),
    (4, 2), (5, 1), (5, 2), (5, 4),
]


def test_matches_brute_force(spark):
    for iters in (1, 2, 3):
        hub, auth = _brute(GRAPH, iters)
        rows = gr.salsa(_edges(spark, GRAPH), iters=iters).collect()
        for r in rows:
            assert abs(r["hub"] - hub[r["node"]]) < 1e-12
            assert abs(r["auth"] - auth[r["node"]]) < 1e-12


def test_l1_invariants_and_degree_zeroes(spark):
    rows = gr.salsa(_edges(spark, GRAPH), iters=2).collect()
    assert abs(sum(r["hub"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["auth"] for r in rows) - 1.0) < 1e-9
    by = {r["node"]: r for r in rows}
    # 0, 3, 5 have no in-links -> auth 0
    assert by[0]["auth"] == by[3]["auth"] == by[5]["auth"] == 0.0
    # a pure sink has no out-links -> hub 0
    rows2 = gr.salsa(_edges(spark, GRAPH + [(1, 7)]), iters=2).collect()
    assert {r["node"]: r for r in rows2}[7]["hub"] == 0.0


def test_tkc_resistance_vs_hits(spark):
    # a 4-clique of mutually-linking spam pages vs one independent page
    # endorsed by 5 distinct hubs. HITS's mutual reinforcement crowns the
    # clique; SALSA's degree-normalized walk favors raw in-link count.
    clique = [(i, j) for i in (10, 11, 12, 13) for j in (10, 11, 12, 13) if i != j]
    honest = [(h, 99) for h in (20, 21, 22, 23, 24)]
    g = clique + honest
    s_auth = {
        r["node"]: r["auth"]
        for r in gr.salsa(_edges(spark, g), iters=3).collect()
    }
    h_auth = {
        r["node"]: r["auth"]
        for r in gr.hits(_edges(spark, g), iters=3).collect()
    }
    assert s_auth[99] > max(s_auth[n] for n in (10, 11, 12, 13))
    assert h_auth[99] < max(h_auth[n] for n in (10, 11, 12, 13))


def test_no_nested_loop_plan(spark):
    plan = (
        gr.salsa(_edges(spark, GRAPH), iters=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan
