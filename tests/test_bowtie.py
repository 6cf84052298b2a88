"""Bow-tie decomposition (graph.bowtie_classes, graph.reachable_from)."""

from __future__ import annotations

from spider_spark.operators import graph as gr

# classic bow-tie: core {10,11,12} cycle; IN {1,2} feed it; OUT {20,21}
# drain it; tendril 30 hangs off IN; disconnected pair {40,41}
BOWTIE = [
    (10, 11), (11, 12), (12, 10),          # core cycle
    (1, 10), (2, 11), (1, 2),              # in-set
    (12, 20), (20, 21),                    # out-chain
    (1, 30),                               # tendril from IN (not via core)
    (40, 41),                              # disconnected
    (10, 12),                              # extra core edge: makes 10 the
                                           # highest-degree pivot
]


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _brute(pairs, pivot):
    fwd_adj, bwd_adj = {}, {}
    for s, d in pairs:
        fwd_adj.setdefault(s, set()).add(d)
        bwd_adj.setdefault(d, set()).add(s)

    def bfs(adj, seed):
        seen, stack = {seed}, [seed]
        while stack:
            for n in adj.get(stack.pop(), ()):
                if n not in seen:
                    seen.add(n)
                    stack.append(n)
        return seen

    fwd, bwd = bfs(fwd_adj, pivot), bfs(bwd_adj, pivot)
    nodes = {n for e in pairs for n in e}
    out = {}
    for n in nodes:
        if n in fwd and n in bwd:
            out[n] = "scc"
        elif n in bwd:
            out[n] = "in"
        elif n in fwd:
            out[n] = "out"
        else:
            out[n] = "other"
    return out


def test_reachable_from(spark):
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"] for r in gr.reachable_from(_edges(spark, BOWTIE), seeds).collect()
    }
    assert got == {1, 2, 10, 11, 12, 20, 21, 30}


def test_bowtie_matches_brute_force(spark):
    # pivot: node 10 has degree 5 (out 11,12,12? -> edges (10,11),(10,12),
    # in (12,10),(1,10)) = 4... compute expected pivot the same way the op
    # does: max (total degree, id)
    deg = {}
    for s, d in BOWTIE:
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    pivot = max(deg, key=lambda n: (deg[n], n))
    want = _brute(BOWTIE, pivot)
    got = {
        r["node"]: r["cls"]
        for r in gr.bowtie_classes(_edges(spark, BOWTIE)).collect()
    }
    assert got == want
    # and the classes are the textbook ones
    assert got[10] == got[11] == got[12] == "scc"
    assert got[1] == got[2] == "in"
    assert got[20] == got[21] == "out"
    assert got[30] == "other" and got[40] == "other" and got[41] == "other"


def test_pure_cycle_all_scc(spark):
    cyc = [(0, 1), (1, 2), (2, 0)]
    got = {
        r["node"]: r["cls"]
        for r in gr.bowtie_classes(_edges(spark, cyc)).collect()
    }
    assert set(got.values()) == {"scc"}
