"""Triangle counting, 2-hop harmonic centrality, and HyperBall.

Discipline: exact operators get brute-force Python differentials on
deterministic random graphs (same input, two independent paths must
agree — the reference's src/index.spec.ts differential style); the
approximate operator (HyperBall) is gated against EXACT truncated ball
sizes / harmonic sums from a Python BFS, with tolerances derived from
the HLL standard error (1.04/sqrt(m))."""

from __future__ import annotations

import itertools
from collections import deque

import pytest

from spider_spark.operators import graph as g


def _rand_edges(n_nodes: int, n_edges: int, seed: int = 7):
    """Deterministic pseudo-random directed edge list (LCG, no RNG import
    so runs are reproducible byte-for-byte)."""
    edges, x = [], seed
    for _ in range(n_edges):
        x = (x * 1103515245 + 12345) % (2**31)
        a = x % n_nodes
        x = (x * 1103515245 + 12345) % (2**31)
        b = x % n_nodes
        edges.append((a, b))
    return edges


def _brute_triangles(edges):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            tri[x] += 1
            tri[y] += 1
            tri[z] += 1
    return adj, tri


def _bfs_balls(edges, radius, reverse=True):
    """Exact |B_t(v)| for t=0..radius plus truncated harmonic sums."""
    adj = {}
    nodes = set()
    for a, b in edges:
        if a == b:
            continue
        s, d = (b, a) if reverse else (a, b)
        adj.setdefault(s, set()).add(d)
        nodes.update((a, b))
    balls, harm = {}, {}
    for v in nodes:
        dist = {v: 0}
        q = deque([v])
        while q:
            u = q.popleft()
            if dist[u] == radius:
                continue
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        balls[v] = len(dist)
        harm[v] = sum(1.0 / d for d in dist.values() if d > 0)
    return balls, harm


# --- triangle_stats -------------------------------------------------------


def test_triangles_k4_every_node_in_three(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    out = {
        r["node"]: r
        for r in g.triangle_stats(spark.createDataFrame(k4, "src int, dst int")).collect()
    }
    assert len(out) == 4
    for v in range(4):
        assert out[v]["degree"] == 3
        assert out[v]["triangles"] == 3
        assert out[v]["clustering"] == 1.0


def test_triangles_path_graph_has_none(spark):
    path = [(i, i + 1) for i in range(5)]
    rows = g.triangle_stats(spark.createDataFrame(path, "src int, dst int")).collect()
    assert all(r["triangles"] == 0 for r in rows)
    assert all(r["clustering"] == 0.0 for r in rows)


def test_triangles_random_graph_matches_brute_force(spark):
    edges = _rand_edges(30, 180, seed=11)
    adj, tri = _brute_triangles(edges)
    rows = g.triangle_stats(
        spark.createDataFrame(edges, "src int, dst int")
    ).collect()
    got = {r["node"]: r for r in rows}
    assert set(got) == set(adj)
    for v, nbrs in adj.items():
        assert got[v]["degree"] == len(nbrs), v
        assert got[v]["triangles"] == tri[v], v
        d = len(nbrs)
        expect_c = round(2.0 * tri[v] / (d * (d - 1)), 6) if d >= 2 else 0.0
        assert got[v]["clustering"] == pytest.approx(expect_c, abs=1e-6)


def test_triangles_ignore_direction_multiplicity_self_loops(spark):
    # duplicate edges, both directions, and a self-loop must not inflate
    edges = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0), (0, 0)]
    rows = g.triangle_stats(spark.createDataFrame(edges, "src int, dst int")).collect()
    assert {r["node"]: r["triangles"] for r in rows} == {0: 1, 1: 1, 2: 1}


# --- harmonic_centrality_2hop --------------------------------------------


def test_harmonic_2hop_star_reverse(spark):
    # spokes -> hub: hub has n1 = 5 inbound at distance 1, nothing at 2
    edges = [(i, 99) for i in range(5)]
    rows = g.harmonic_centrality_2hop(
        spark.createDataFrame(edges, "src int, dst int")
    ).collect()
    got = {r["node"]: r for r in rows}
    assert set(got) == {99}
    assert got[99]["n1"] == 5 and got[99]["n2"] == 0
    assert got[99]["harmonic2"] == 5.0


def test_harmonic_2hop_chain_counts_distance_two(spark):
    # a -> b -> c: c sees b at 1 and a at 2
    edges = [(0, 1), (1, 2)]
    rows = g.harmonic_centrality_2hop(
        spark.createDataFrame(edges, "src int, dst int")
    ).collect()
    got = {r["node"]: (r["n1"], r["n2"], r["harmonic2"]) for r in rows}
    assert got[2] == (1, 1, 1.5)
    assert got[1] == (1, 0, 1.0)
    assert 0 not in got  # no inbound edges


def test_harmonic_2hop_matches_bfs_on_random_graph(spark):
    edges = _rand_edges(25, 120, seed=3)
    balls1, _ = _bfs_balls(edges, 1, reverse=True)
    balls2, _ = _bfs_balls(edges, 2, reverse=True)
    rows = g.harmonic_centrality_2hop(
        spark.createDataFrame(edges, "src int, dst int")
    ).collect()
    got = {r["node"]: r for r in rows}
    for v in balls2:
        n1 = balls1[v] - 1
        n2 = balls2[v] - balls1[v]
        if n1 == 0:
            assert v not in got
            continue
        assert got[v]["n1"] == n1, v
        assert got[v]["n2"] == n2, v
        assert got[v]["harmonic2"] == pytest.approx(n1 + n2 / 2.0, abs=1e-6)


def test_harmonic_2hop_forward_direction(spark):
    edges = [(0, 1), (1, 2)]
    rows = g.harmonic_centrality_2hop(
        spark.createDataFrame(edges, "src int, dst int"), reverse=False
    ).collect()
    got = {r["node"]: (r["n1"], r["n2"]) for r in rows}
    assert got[0] == (1, 1) and got[1] == (1, 0)


# --- hyperball ------------------------------------------------------------


def test_hyperball_estimates_truncated_balls(spark):
    edges = _rand_edges(60, 360, seed=5)
    radius, log2m = 3, 7  # m=128 -> HLL rel. std err ~9%
    balls, harm = _bfs_balls(edges, radius, reverse=True)
    rows = g.hyperball(
        spark.createDataFrame(edges, "src int, dst int"),
        radius=radius,
        log2m=log2m,
    ).collect()
    got = {r["node"]: r for r in rows}
    assert set(got) == set(balls)
    rel_errs = []
    for v, exact in balls.items():
        est = got[v]["ball_est"]
        rel_errs.append(abs(est - exact) / exact)
        # per-node: within 4 sigma of the HLL error for this m
        assert abs(est - exact) / exact < 4 * 1.04 / (2**log2m) ** 0.5, (
            v,
            est,
            exact,
        )
    # in aggregate the estimator must be much tighter than the bound
    assert sum(rel_errs) / len(rel_errs) < 0.12
    # harmonic: ranking-quality gate — mean relative error bounded
    h_errs = [
        abs(got[v]["harmonic_est"] - harm[v]) / harm[v]
        for v in balls
        if harm[v] > 0
    ]
    assert sum(h_errs) / len(h_errs) < 0.2


def test_hyperball_star_graph_small_range_exact(spark):
    # 40 spokes -> hub; hub ball at r=1 is 41 nodes, spokes stay singletons
    edges = [(i, 999) for i in range(40)]
    rows = g.hyperball(
        spark.createDataFrame(edges, "src int, dst int"), radius=1, log2m=8
    ).collect()
    got = {r["node"]: r for r in rows}
    # linear-count regime: estimates are near-exact for tiny balls
    assert got[999]["ball_est"] == pytest.approx(41, rel=0.15)
    for i in range(40):
        assert got[i]["ball_est"] == pytest.approx(1, rel=0.1)
        assert got[i]["harmonic_est"] == pytest.approx(0.0, abs=0.35)


def test_hyperball_deterministic_across_runs(spark):
    edges = _rand_edges(30, 150, seed=9)
    df = spark.createDataFrame(edges, "src int, dst int")
    a = sorted(map(tuple, g.hyperball(df, radius=2, log2m=6).collect()))
    b = sorted(map(tuple, g.hyperball(df, radius=2, log2m=6).collect()))
    assert a == b


def test_hyperball_rejects_bad_log2m(spark):
    df = spark.createDataFrame([(0, 1)], "src int, dst int")
    with pytest.raises(ValueError):
        g.hyperball(df, log2m=3)


# --- cocitation_similarity -------------------------------------------------


def _brute_cocitation(edges, direction, min_common, max_fanout):
    piv = {}
    for s, d in set(edges):
        if s == d:
            continue
        if direction == "in":
            piv.setdefault(s, set()).add(d)
        else:
            piv.setdefault(d, set()).add(s)
    piv = {p: ns for p, ns in piv.items() if len(ns) <= max_fanout}
    deg = {}
    for ns in piv.values():
        for n in ns:
            deg[n] = deg.get(n, 0) + 1
    common = {}
    for ns in piv.values():
        for a, b in itertools.combinations(sorted(ns), 2):
            common[(a, b)] = common.get((a, b), 0) + 1
    return {
        (a, b): (c, c / (deg[a] + deg[b] - c))
        for (a, b), c in common.items()
        if c >= min_common
    }


def test_cocitation_hand_graph(spark):
    # pages 10 and 11 are both linked from 0, 1, 2; page 12 only from 0
    edges = [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10), (2, 11), (0, 12)]
    rows = g.cocitation_similarity(
        spark.createDataFrame(edges, "src int, dst int"), min_common=2
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"], r["common"]) == (10, 11, 3)
    assert r["jaccard"] == pytest.approx(1.0)  # identical in-linker sets


def test_cocitation_matches_brute_force_both_directions(spark):
    edges = _rand_edges(40, 260, seed=13)
    df = spark.createDataFrame(edges, "src int, dst int")
    for direction in ("in", "out"):
        want = _brute_cocitation(edges, direction, min_common=2, max_fanout=100)
        got = {
            (r["a"], r["b"]): (r["common"], r["jaccard"])
            for r in g.cocitation_similarity(df, direction=direction).collect()
        }
        assert set(got) == set(want), direction
        for k, (c, j) in want.items():
            assert got[k][0] == c
            assert got[k][1] == pytest.approx(j, abs=1e-6)


def test_cocitation_fanout_cap_drops_directory_pages(spark):
    # a 10-outlink hub pivot is dropped at max_fanout=5: no pairs remain
    edges = [(0, i) for i in range(1, 11)]
    df = spark.createDataFrame(edges, "src int, dst int")
    assert g.cocitation_similarity(df, min_common=1, max_fanout=5).count() == 0
    # and kept when the cap allows it: C(10,2) pairs each with common=1
    assert g.cocitation_similarity(df, min_common=1, max_fanout=10).count() == 45


def test_cocitation_rejects_bad_direction(spark):
    df = spark.createDataFrame([(0, 1)], "src int, dst int")
    with pytest.raises(ValueError):
        g.cocitation_similarity(df, direction="sideways")


# --- lpa_communities --------------------------------------------------------


def _brute_lpa(edges, sweeps):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {v: v for v in adj}
    for _ in range(sweeps):
        new = {}
        for v in adj:
            counts = {}
            for n in adj[v]:
                counts[lab[n]] = counts.get(lab[n], 0) + 1
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[v] = best
        lab = new
    return lab


def test_lpa_two_cliques_converge_to_min_ids(spark):
    # two triangles bridged by one edge: each clique adopts its min id
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)]
    got = {
        r["node"]: r["community"]
        for r in g.lpa_communities(
            spark.createDataFrame(edges, "src int, dst int"), sweeps=3
        ).collect()
    }
    # each triangle is one community; the min-label tie-break lets label 2
    # cross the bridge, so the right clique converges on 2, the left on 0
    assert got[0] == got[1] == got[2] == 0
    assert got[10] == got[11] == got[12] == 2


def test_lpa_matches_brute_force(spark):
    edges = _rand_edges(35, 140, seed=21)
    df = spark.createDataFrame(edges, "src int, dst int")
    for sweeps in (1, 2, 4):
        want = _brute_lpa(edges, sweeps)
        got = {
            r["node"]: r["community"]
            for r in g.lpa_communities(df, sweeps=sweeps).collect()
        }
        assert got == want, sweeps


def test_lpa_deterministic_tie_break(spark):
    # node 5 has two neighbors with distinct labels after sweep 1 start:
    # tie on count=1 -> smallest label wins
    edges = [(5, 1), (5, 3)]
    got = {
        r["node"]: r["community"]
        for r in g.lpa_communities(
            spark.createDataFrame(edges, "src int, dst int"), sweeps=1
        ).collect()
    }
    assert got[5] == 1
