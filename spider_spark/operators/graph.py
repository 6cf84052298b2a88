"""Graph operators over crawl/dedup outputs: connected components and
PageRank-style link ranking.

Why these live in a crawl engine:
- The near-dup family (minhash/simhash/embedding) emits PAIRS; training-data
  dedup needs CLUSTERS (keep one doc per component). ``connected_components``
  closes that gap.
- A frontier at 10^10 URLs needs a better priority than FIFO; link-graph
  rank over the already-crawled edge set (results snapshots carry the full
  ``links`` arrays) is the classic signal (OPIC/PageRank-ordered crawling).

Both are iterative: a driver-side loop over hash joins + partial aggs —
the Pregel-without-Pregel shape. Each iteration is one shuffle keyed by
node id; lineage is cut per iteration (persist + count) so plans don't
deepen. Iteration counts are small by construction: dedup components are
star-like (diameter ≤ 2-3), and rank needs a fixed handful of sweeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """Undirected connected components by min-label propagation: every node
    ends with ``component`` = the smallest node id reachable from it.

    Each sweep: label(u) ← min(label(u), min over neighbors label(v)) — one
    hash-join edges⋈labels + one partial-agg groupBy(node) — followed by a
    POINTER-DOUBLING hop (label(u) ← label(label(u))), so the distance a
    minimum travels roughly doubles per sweep: convergence is
    O(log diameter), not O(diameter) — a 1000-link chain of gradually
    mutating boilerplate pages resolves in ~10 sweeps. All shuffles are
    keyed on node id with map-side combine, O(|E|) each. The loop stops
    when the neighbor-min step changes nothing (at that fixpoint the hop
    is idempotent too); exhausting ``max_iters`` without converging
    RAISES rather than silently returning split components — a wrong
    dedup clustering is worse than a failed job.

    Lineage discipline: ``labels`` feeds multiple operators per sweep, so
    without a cut the logical plan doubles every sweep — exponential
    analysis time by ~iteration 10. Each sweep therefore materializes via
    ``localCheckpoint`` (the driver loop already forces an action for the
    convergence count; a production run over an unreliable cluster would
    use a reliable checkpoint dir, same shape)."""
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).persist()
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("component", F.col("node"))
    ).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels.select(F.col("node").alias("b"), "component"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_comp"))
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_comp") < F.col("component")).alias("_changed"),
            )
            .persist()  # feeds both the hop lookup and the merge below
        )
        # pointer doubling: follow the label one more hop (component's own
        # current label) — costs one extra node-keyed join per sweep and
        # turns linear label travel into exponential
        hop = stepped.select(
            F.col("node").alias("component"), F.col("component").alias("_hop")
        )
        new_labels = (
            stepped.join(hop, "component", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce(F.col("_hop"), F.col("component"))).alias(
                    "component"
                ),
                "_changed",
            )
        ).localCheckpoint(eager=True)
        stepped.unpersist()
        changed = new_labels.filter("_changed").count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} sweeps; "
            "raise max_iters (components deeper than 2^max_iters are implausible "
            "for dedup graphs — check the edge set)"
        )
    return labels


def dedup_keep_one_per_component(
    docs: DataFrame, components: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Cluster-level dedup: keep the doc whose id equals its component's
    min (the component label itself) — the cluster representative; every
    other member is dropped. One broadcast-or-hash semi-join."""
    keep = components.filter(F.col("node") == F.col("component")).select(
        F.col("node").alias(id_col)
    )
    dup_members = components.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(dup_members, id_col, "left_anti")


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge set: rank = (1−d) +
    d·Σ rank(in)/outdeg(in), starting from rank=1. No dangling-mass
    redistribution (documented simplification — crawl frontiers use the
    rank as a relative priority, not a probability).

    Per iteration: one join edges⋈ranks on src + one partial-agg
    groupBy(dst) — O(|E|) shuffle each, same physical shape as the
    components sweep. Returns (node, rank) for every node appearing as a
    src or dst, materialized via ``localCheckpoint`` so the intermediate
    caches this function pins (``base``, reused every iteration) can be
    released before returning — repeated calls (e.g. ``rerank_frontier``
    every N ticks) must not leak cached partitions."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("s").alias("node")).agg(F.count("*").alias("outdeg"))
    base = nodes.join(outdeg, "node", "left").persist()
    ranks = base.select("node", F.lit(1.0).alias("rank"), "outdeg")
    for i in range(iters):
        contrib = (
            e.join(ranks.select(F.col("node").alias("s"), "rank", "outdeg"), "s")
            .select(F.col("d").alias("node"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            base.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("rank"),
                "outdeg",
            )
        )
        # rank depth grows linearly (ranks feeds one join per sweep), but
        # cut lineage every few sweeps so deep runs stay cheap to plan
        if (i + 1) % 4 == 0:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("node", "rank").localCheckpoint(eager=True)
    base.unpersist()
    return out


def frontier_rank_priority(
    frontier: DataFrame, ranks: DataFrame, base_priority: int = 200, scale: int = 100
) -> DataFrame:
    """Fold a link-graph rank into frontier priority: higher rank ⇒ lower
    (= earlier) priority number, clamped to stay inside the reference's
    adapter band structure (100-999, src/platform/types.ts:61-66). Rows
    without a rank keep their current priority. Broadcast-joinable: the
    rank table is O(crawled URLs), the frontier side stays put."""
    adj = ranks.select(
        F.col("node").alias("url_canon"),
        F.greatest(
            F.lit(100),
            (F.lit(base_priority) - F.least(F.col("rank"), F.lit(1.0)) * scale).cast("int"),
        ).alias("_rank_priority"),
    )
    return frontier.join(adj, "url_canon", "left").withColumn(
        "priority", F.coalesce(F.col("_rank_priority"), F.col("priority"))
    ).drop("_rank_priority")


def anchor_text_aggregate(
    links: DataFrame,
    dst_col: str = "dst",
    text_col: str = "anchor",
    src_col: str = "src",
) -> DataFrame:
    """Per-target anchor-text rollup — the classic off-page relevance
    signal (anchor text describes the TARGET page better than the source;
    focused crawlers and search indexes both rank on it). Counterpart of
    the reference's per-link anchor capture (links.ts Link.text): here the
    extracted links are aggregated per destination so the frontier can
    prioritize URLs whose inbound anchors look relevant before fetching
    them.

    Input: one row per extracted link (src page, dst url, anchor text).
    Output per dst: ``n_inlinks`` (all inlinks), ``n_sources`` (distinct
    source pages), ``n_anchor_variants`` (distinct non-empty normalized
    anchors), ``top_anchor`` + ``top_anchor_count`` (modal normalized
    anchor, ties broken lexicographically; null when every anchor is
    empty). Anchors normalize by trim+lower; empty/null anchors count as
    inlinks but not as anchor variants.

    Scale shape: two partial-agg shuffles keyed on dst (counts, then the
    modal pick via a per-dst max over (count, anchor) structs — no window
    over raw links). Output rows = distinct targets; joins back to the
    frontier broadcast-side like frontier_rank_priority."""
    norm = F.lower(F.trim(F.col(text_col)))
    base = links.select(
        F.col(dst_col).alias("url"),
        F.col(src_col).alias("_src"),
        F.when(norm != "", norm).alias("_anchor"),
    )
    totals = base.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.countDistinct("_src").alias("n_sources"),
        F.countDistinct("_anchor").alias("n_anchor_variants"),
    )
    per_anchor = (
        base.filter(F.col("_anchor").isNotNull())
        .groupBy("url", "_anchor")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # modal anchor without a window over raw links: min_by over
    # struct(-c, anchor) — smallest -c = highest count, tie toward the
    # lexicographically smallest anchor
    top = per_anchor.groupBy("url").agg(
        F.expr("min_by(_anchor, struct(-c, _anchor))").alias("top_anchor"),
        F.max("c").alias("top_anchor_count"),
    )
    return totals.join(top, "url", "left").select(
        "url",
        "n_inlinks",
        "n_sources",
        "n_anchor_variants",
        "top_anchor",
        "top_anchor_count",
    )


def canonical_url_clusters(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """Collapse URL aliases into canonical clusters: the edges are
    "this URL defers to that URL" claims — HTTP redirects (301/302/308),
    ``<link rel=canonical>``, ``<meta http-equiv=refresh>`` — and every
    URL in a connected family should be crawled, deduped, and ranked as
    ONE identity (Google's canonicalization model; spider follows the
    same chain when it keeps the final URL of a redirect walk,
    simple.ts:94-120).

    Representative selection is where the direction (which CC discards)
    comes back: prefer a **terminal** — a URL that never defers to
    anything (never appears as ``src``) — because chains point AT the
    canonical; among several terminals (or none, i.e. a redirect cycle)
    the lexicographically smallest URL wins, so the choice is
    deterministic and engine-portable.

    Cost: `connected_components`'s O(|E|) pointer-doubling sweeps plus
    one groupBy(component) min — nothing keyed on anything but node /
    component ids. Returns (url, component, canonical_url,
    is_canonical).
    """
    cc = connected_components(edges, src=src, dst=dst, max_iters=max_iters)
    srcs = (
        edges.select(F.col(src).alias("node"))
        .distinct()
        .withColumn("_defers", F.lit(1))
    )
    nodes = cc.join(srcs, "node", "left").select(
        "node",
        "component",
        F.coalesce(F.col("_defers"), F.lit(0)).alias("_defers"),
    )
    reps = nodes.groupBy("component").agg(
        F.min(F.struct(F.col("_defers"), F.col("node"))).alias("best")
    )
    return nodes.join(reps, "component").select(
        F.col("node").alias("url"),
        "component",
        F.col("best.node").alias("canonical_url"),
        (F.col("node") == F.col("best.node")).alias("is_canonical"),
    )


def opic(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """On-line Page Importance Computation (Abiteboul, Preda & Cobéna,
    WWW 2003) — the importance estimator built FOR crawling: unlike
    PageRank it needs no convergence before the numbers are usable, so
    a frontier can rerank from it mid-crawl. Each node holds *cash*
    (init 1.0) and *history* (init 0). Per sweep, every node banks its
    cash into history and distributes it equally to its out-neighbors;
    dangling cash is redistributed uniformly over all nodes (the
    paper's virtual-root shortcut, documented simplification).
    Importance after k sweeps = history + cash.

    Total cash is conserved at |V| every sweep (asserted in tests), so
    scores are comparable across sweeps — the property that lets OPIC
    interleave with fetching.

    Physical shape per sweep: the same O(|E|) edges⋈state join +
    partial-agg groupBy(dst) as `pagerank`, plus ONE 1-row aggregate
    (dangling total) attached via the constant-key BroadcastHashJoin
    idiom (`join_scalar_frame`) — never a nested loop, never a global
    sort. Returns (node, history, cash, importance).
    """
    from . import join_scalar_frame

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("s").alias("node")).agg(F.count("*").alias("outdeg"))
    base = nodes.join(outdeg, "node", "left").persist()
    n_nodes = base.groupBy().agg(F.count(F.lit(1)).alias("n_nodes"))
    state = base.select(
        "node", F.lit(1.0).alias("cash"), F.lit(0.0).alias("hist"), "outdeg"
    )
    for i in range(iters):
        contrib = (
            e.join(
                state.select(F.col("node").alias("s"), "cash", "outdeg"), "s"
            )
            .select(
                F.col("d").alias("node"),
                (F.col("cash") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        dangling = state.where(F.col("outdeg").isNull()).groupBy().agg(
            F.coalesce(F.sum("cash"), F.lit(0.0)).alias("dang")
        )
        scal = join_scalar_frame(dangling, n_nodes)
        state = (
            join_scalar_frame(
                state.select(
                    "node",
                    (F.col("hist") + F.col("cash")).alias("hist"),
                    "outdeg",
                ).join(contrib, "node", "left"),
                scal,
            )
            .select(
                "node",
                (
                    F.coalesce(F.col("in_sum"), F.lit(0.0))
                    + F.col("dang") / F.col("n_nodes")
                ).alias("cash"),
                "hist",
                "outdeg",
            )
        )
        if (i + 1) % 4 == 0:
            state = state.localCheckpoint(eager=True)
    out = state.select(
        "node",
        "hist",
        "cash",
        (F.col("hist") + F.col("cash")).alias("importance"),
    ).localCheckpoint(eager=True)
    base.unpersist()
    return out


def hits(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM 1999) — the second classic
    link-rank a crawl corpus feeds: authorities are pages many good hubs
    point AT (target quality), hubs are pages that point at many good
    authorities (link-list quality). Frontier use: hub scores find the
    directory/sitemap-like pages whose outlinks are worth expanding first.

    Per sweep: auth(v) = Σ_{u→v} hub(u), then hub(u) = Σ_{u→v} auth(v),
    each L1-normalized (sum-normalization — engine-portable, no sqrt
    ulps). Init hub = 1. Nodes with no in-edges get auth 0; no out-edges
    hub 0.

    Physical shape per sweep: two O(|E|) edges⋈state joins + two
    partial-agg groupBys, plus two 1-row L1 totals attached via the
    constant-key BroadcastHashJoin idiom — never a global sort or nested
    loop. Returns (node, hub, auth)."""
    from . import join_scalar_frame

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .persist()
    )
    state = nodes.select("node", F.lit(1.0).alias("hub"), F.lit(0.0).alias("auth"))
    for i in range(iters):
        auth_raw = (
            e.join(state.select(F.col("node").alias("s"), "hub"), "s")
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("hub").alias("a_raw"))
        )
        auth_tot = auth_raw.groupBy().agg(F.sum("a_raw").alias("a_tot"))
        # materialize each half-sweep: unlike pagerank (whose state feeds
        # exactly ONE join per sweep, so lineage grows linearly), auths is
        # consumed twice below and state twice next sweep — left lazy,
        # every consumer re-derives the whole prior sweep and the DAG
        # multiplies ~4× per iteration (measured 30 s for 2 sweeps at
        # sf0.1 vs ~3 s checkpointed).
        auths = join_scalar_frame(
            nodes.join(auth_raw, "node", "left"), auth_tot
        ).select(
            "node",
            (F.coalesce(F.col("a_raw"), F.lit(0.0)) / F.col("a_tot")).alias("auth"),
        ).localCheckpoint(eager=True)
        hub_raw = (
            e.join(auths.select(F.col("node").alias("d"), "auth"), "d")
            .groupBy(F.col("s").alias("node"))
            .agg(F.sum("auth").alias("h_raw"))
        )
        hub_tot = hub_raw.groupBy().agg(F.sum("h_raw").alias("h_tot"))
        state = join_scalar_frame(
            nodes.join(hub_raw, "node", "left").join(auths, "node"), hub_tot
        ).select(
            "node",
            (F.coalesce(F.col("h_raw"), F.lit(0.0)) / F.col("h_tot")).alias("hub"),
            "auth",
        ).localCheckpoint(eager=True)
    nodes.unpersist()
    return state


def salsa(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """SALSA (Lempel & Moran WWW'00 / TOIT'01) — HITS with the mutual
    reinforcement replaced by a RANDOM WALK on the bipartite hub/auth
    graph: auth(v) = Σ_{u→v} hub(u)/outdeg(u), hub(u) = Σ_{u→v}
    auth(v)/indeg(v). The degree division is the point: it cures the
    tightly-knit-community (TKC) effect where a small dense clique of
    mutually-linking pages monopolizes HITS's top authorities — exactly
    the link-farm shape spam_mass and kcore_survivors hunt, so SALSA is
    the ranking-side complement to those detectors. Init hub = 1; each
    half-sweep L1-normalized (engine-portable, no sqrt ulps), fixed
    ``iters`` so the oracle can unroll it.

    Physical shape per sweep: identical to `hits` — two O(|E|)
    edges⋈state joins + two partial-agg groupBys + two 1-row L1 totals
    on the constant-key BroadcastHashJoin — plus a one-time degree
    census joined onto the edge table (outdeg/indeg are edge-table
    partial aggs, bounded by distinct endpoints). Returns
    (node, hub, auth)."""
    from . import join_scalar_frame

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    outd = e.groupBy("s").agg(F.count(F.lit(1)).alias("od"))
    ind = e.groupBy("d").agg(F.count(F.lit(1)).alias("indeg"))
    # edge table with both degree weights attached once; reused by every
    # half-sweep in both directions
    ew = e.join(outd, "s").join(ind, "d").persist()
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .persist()
    )
    state = nodes.select("node", F.lit(1.0).alias("hub"), F.lit(0.0).alias("auth"))
    for _ in range(iters):
        auth_raw = (
            ew.join(state.select(F.col("node").alias("s"), "hub"), "s")
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum(F.col("hub") / F.col("od")).alias("a_raw"))
        )
        auth_tot = auth_raw.groupBy().agg(F.sum("a_raw").alias("a_tot"))
        auths = join_scalar_frame(
            nodes.join(auth_raw, "node", "left"), auth_tot
        ).select(
            "node",
            (F.coalesce(F.col("a_raw"), F.lit(0.0)) / F.col("a_tot")).alias(
                "auth"
            ),
        ).localCheckpoint(eager=True)
        hub_raw = (
            ew.join(auths.select(F.col("node").alias("d"), "auth"), "d")
            .groupBy(F.col("s").alias("node"))
            .agg(F.sum(F.col("auth") / F.col("indeg")).alias("h_raw"))
        )
        hub_tot = hub_raw.groupBy().agg(F.sum("h_raw").alias("h_tot"))
        state = join_scalar_frame(
            nodes.join(hub_raw, "node", "left").join(auths, "node"), hub_tot
        ).select(
            "node",
            (F.coalesce(F.col("h_raw"), F.lit(0.0)) / F.col("h_tot")).alias(
                "hub"
            ),
            "auth",
        ).localCheckpoint(eager=True)
    ew.unpersist()
    nodes.unpersist()
    return state


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004): PageRank
    with the teleport confined to a hand-vetted trusted seed set, so trust
    decays with link distance from the seeds — the classic spam-demotion
    signal a frontier combines with host reputation. t₀ = 1/|S| on seeds,
    0 elsewhere; per iteration t(v) = (1−d)·d₀(v) + d·Σ_in t(u)/outdeg(u).
    No dangling-mass redistribution (same documented simplification as
    ``pagerank`` — the score is a relative priority, not a probability).

    Per iteration: one O(|E|) edges⋈trust join + one partial-agg
    groupBy(dst); the seed indicator is a broadcast-size semi-joinable
    table. Returns (node, trust) for every node in the edge set."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("s").alias("node")).agg(F.count("*").alias("outdeg"))
    seed_ids = seeds.select(F.col(seed_col).alias("node")).distinct()
    n_seeds = seed_ids.count()
    if n_seeds == 0:
        raise ValueError("trustrank needs a non-empty seed set")
    base = (
        nodes.join(outdeg, "node", "left")
        .join(seed_ids.withColumn("_seed", F.lit(True)), "node", "left")
        .select(
            "node",
            "outdeg",
            F.when(F.col("_seed"), F.lit(1.0 / n_seeds)).otherwise(F.lit(0.0)).alias("d0"),
        )
        .persist()
    )
    trust = base.select("node", F.col("d0").alias("trust"), "outdeg")
    for i in range(iters):
        contrib = (
            e.join(trust.select(F.col("node").alias("s"), "trust", "outdeg"), "s")
            .select(F.col("d").alias("node"), (F.col("trust") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        trust = (
            base.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("d0")
                    + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("trust"),
                "outdeg",
            )
        )
        if (i + 1) % 4 == 0:
            trust = trust.localCheckpoint(eager=True)
    out = trust.select("node", "trust").localCheckpoint(eager=True)
    base.unpersist()
    return out


def kcore_survivors(
    edges: DataFrame,
    k: int,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core peeling (Seidman 1983; the dense-subgraph signal link-farm
    hunts use — a spam alliance's mutual-link core survives peeling that
    strips the organic periphery): repeatedly drop nodes with UNDIRECTED
    degree < k until fixpoint. ``rounds`` bounds the sweeps — peeling is
    monotone, so the result after R rounds is a SUPERSET of the true
    k-core and equals it once a round removes nothing (small-graph
    fixpoints are pytest-pinned; the oracle unrolls the same R rounds).

    Per round: one degree census (partial agg over surviving edges) +
    two semi-joins — O(|E|) each, lineage cut per round via
    localCheckpoint. Returns (node,) survivors."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).where(
        F.col("s") != F.col("d")
    )
    und = e.select(
        F.least("s", "d").alias("a"), F.greatest("s", "d").alias("b")
    ).distinct()
    for _ in range(rounds):
        deg = (
            und.select(F.col("a").alias("node"))
            .unionByName(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("node")
        und = (
            und.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .distinct()
    )


def spam_mass(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Spam mass (Gyöngyi, Berkhin, Garcia-Molina & Pedersen, VLDB 2006,
    "Link Spam Detection Based on Mass Estimation"): how much of a page's
    PageRank arrives from OUTSIDE the trusted core. Composes the two
    rank operators this repo already has: PR (uniform teleport, the
    (1−d)+d·Σ convention, per-node teleport mass 1) and TrustRank
    (teleport 1/|S| on seeds, total mass 1). Scaling n·trust puts the
    trusted-core PR on PR's convention (same total teleport mass n by
    linearity of the recursion), so

        mass(p) = PR(p) − n·trust(p);  rel_mass(p) = mass/PR.

    rel_mass → 1 flags rank earned from untrusted (spam-suspect) links;
    ≈0 means the page's rank is seed-backed. Same O(|E|)-per-sweep
    physical shape as the two components; the combine is one node-keyed
    join + a 1-row scalar hash-join for n. Returns
    (node, pr_r, core_r, mass_r, rel_mass_r), all rounded 6."""
    from . import join_scalar_frame

    pr = pagerank(edges, iters=iters, damping=damping, src=src, dst=dst)
    tr = trustrank(
        edges, seeds, iters=iters, damping=damping, src=src, dst=dst,
        seed_col=seed_col,
    )
    n_nodes = pr.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    j = join_scalar_frame(pr.join(tr, "node"), n_nodes)
    core = F.col("_n") * F.col("trust")
    mass = F.col("rank") - core
    return j.select(
        "node",
        F.round("rank", 6).alias("pr_r"),
        F.round(core, 6).alias("core_r"),
        F.round(mass, 6).alias("mass_r"),
        F.round(
            F.when(F.col("rank") > 0, mass / F.col("rank")), 6
        ).alias("rel_mass_r"),
    )


def bfs_depth(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 3,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Minimum-hop crawl depth from the seed set: (node, depth) for every
    node reachable in ≤ ``max_depth`` hops. The crawl-analysis staple —
    depth histograms expose trap-ish deep tails, and depth caps are the
    oldest frontier scope rule in crawling (Heritrix's max-hops).

    Per sweep: frontier-of-last-wave ⋈ edges on src + groupBy(dst) min —
    O(edges-out-of-wave), not O(|E|), because only the newest wave
    expands (classic frontier BFS, not dense relaxation). Early-exits
    when a wave adds nothing. Depth is bounded by construction, so the
    O(diameter) sweep count is ``max_depth`` — unlike components, no
    pointer-doubling is needed. Returns (node, depth)."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    depths = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("depth", F.lit(0))
        .localCheckpoint(eager=True)
    )
    wave = depths
    for k in range(1, max_depth + 1):
        nxt = (
            e.join(wave.select(F.col("node").alias("s")), "s")
            .select(F.col("d").alias("node"))
            .distinct()
            .join(depths.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(k))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        depths = depths.unionByName(nxt).localCheckpoint(eager=True)
        wave = nxt
    return depths


def relevance_to_targets(
    edges: DataFrame,
    scores: DataFrame,
    src: str = "src",
    dst: str = "dst",
    score_col: str = "score_r",
) -> DataFrame:
    """Focused-crawl link propagation (Chakrabarti, van den Berg & Dom,
    WWW 1999): an uncrawled URL inherits the best topical-relevance
    score among the crawled pages that link to it — the optimistic
    parent-vouches signal a focused frontier ranks by. ONE O(|E|)
    edges⋈scores equi-join + partial-agg max per dst. Returns
    (node, relevance) for targets with at least one scored parent."""
    return (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("node"))
        .join(scores.select(F.col("doc_id").alias("s"), F.col(score_col).alias("r")), "s")
        .groupBy("node")
        .agg(F.max("r").alias("relevance"))
    )


def weighted_pagerank(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """PageRank over a WEIGHTED edge set: each node splits its rank
    proportionally to edge weight instead of equally — the form the
    host-graph rollup needs, where an edge's weight is the number of
    underlying URL-level links. rank = (1−d) + d·Σ rank(u)·w(u,v)/W(u),
    W(u) = Σ out-weights. Same O(|E|)-per-sweep join + partial-agg shape
    and the same no-dangling-redistribution simplification as
    ``pagerank``. Returns (node, rank)."""
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d"), F.col(weight).cast("double").alias("w")
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
    )
    wout = e.groupBy(F.col("s").alias("node")).agg(F.sum("w").alias("wout"))
    base = nodes.join(wout, "node", "left").persist()
    ranks = base.select("node", F.lit(1.0).alias("rank"), "wout")
    for i in range(iters):
        contrib = (
            e.join(ranks.select(F.col("node").alias("s"), "rank", "wout"), "s")
            .select(
                F.col("d").alias("node"),
                (F.col("rank") * F.col("w") / F.col("wout")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            base.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("rank"),
                "wout",
            )
        )
        if (i + 1) % 4 == 0:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("node", "rank").localCheckpoint(eager=True)
    base.unpersist()
    return out


def col_url_authority(url_col):
    """scheme://AUTHORITY/… → lowercased authority, null when the value
    doesn't parse as an absolute URL. Pure codegen — the host-graph
    coarsening must not cost a Python UDF per edge."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    host = F.lower(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    return F.when(host != "", host)


def host_graph(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    drop_self_loops: bool = True,
) -> DataFrame:
    """Roll a URL-level link graph up to the host graph: (src_host,
    dst_host, weight = underlying link count). THE scale move for link
    analysis at 10^10 URLs — the host graph is ~10^7 nodes, so rank
    sweeps run three orders of magnitude cheaper, and host-level rank is
    what reputation/spam systems consume anyway. Self-loops (intra-host
    links, the overwhelming majority) are dropped by default before the
    census shuffle. One projection + one partial-agg groupBy."""
    hg = edges.select(
        col_url_authority(src).alias("src_host"),
        col_url_authority(dst).alias("dst_host"),
    ).where(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
    if drop_self_loops:
        hg = hg.where(F.col("src_host") != F.col("dst_host"))
    return hg.groupBy("src_host", "dst_host").agg(F.count(F.lit(1)).alias("weight"))


def degree_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node in/out degree over a directed edge set — the first
    number a web-graph data card reports (degree distributions are the
    canonical power-law diagnostic; a crawl whose out-degree tail
    explodes is eating a link farm). Two partial-agg censuses + one
    outer join, all keyed on node. Returns (node, in_deg, out_deg)."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    outd = e.groupBy(F.col("s").alias("node")).agg(F.count(F.lit(1)).alias("out_deg"))
    ind = e.groupBy(F.col("d").alias("node")).agg(F.count(F.lit(1)).alias("in_deg"))
    return (
        outd.join(ind, "node", "full")
        .select(
            "node",
            F.coalesce(F.col("in_deg"), F.lit(0)).alias("in_deg"),
            F.coalesce(F.col("out_deg"), F.lit(0)).alias("out_deg"),
        )
    )


def degree_histogram(
    edges: DataFrame,
    direction: str = "in",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """log2-bucketed degree histogram: (bucket = floor(log2(degree)),
    n_nodes, min/max degree in bucket). The power-law fingerprint in ~30
    rows regardless of graph size — the right artifact to ship in a
    data card at 10^10 edges. One census + one partial agg."""
    if direction not in ("in", "out"):
        raise ValueError("direction must be 'in' or 'out'")
    deg = degree_stats(edges, src, dst).select(
        F.col(f"{direction}_deg").alias("deg")
    ).where(F.col("deg") > 0)
    return (
        deg.select(F.floor(F.log2("deg")).cast("int").alias("bucket"), "deg")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("deg").alias("min_deg"),
            F.max("deg").alias("max_deg"),
        )
    )


def contract_edges(
    edges: DataFrame,
    mapping: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    rep_col: str = "canonical_url",
) -> DataFrame:
    """Contract a link graph through an alias mapping (redirect chains /
    rel=canonical — ``canonical_url_clusters`` output): every endpoint is
    rewritten to its representative (nodes absent from the mapping keep
    themselves), self-loops created by the contraction are dropped, and
    parallel edges collapse to (src, dst, weight). Link analysis over the
    contracted graph stops splitting a page's rank across its aliases —
    the same hygiene canonicalization gives the seen filter. Two equi-
    joins (mapping side broadcastable: O(aliased URLs)) + one census."""
    m = mapping.select(F.col(node_col).alias("_n"), F.col(rep_col).alias("_r"))
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .join(m.withColumnRenamed("_n", "_s"), "_s", "left")
        .select(F.coalesce(F.col("_r"), F.col("_s")).alias("src"), "_d")
        .join(m.withColumnRenamed("_n", "_d"), "_d", "left")
        .select("src", F.coalesce(F.col("_r"), F.col("_d")).alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    return e.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight"))


def reciprocal_link_stats(
    host_edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
) -> DataFrame:
    """Nepotistic-link signal (Davison, AAAI 2000 workshop): the fraction
    of a host's distinct out-neighbors that link straight back. Link
    exchanges / rings reciprocate near 1.0; editorial linking mostly
    doesn't. Consumed next to TrustRank by the frontier's reputation
    screen.

    ONE self-equi-join of the (already host-level, so ~10^7-row) edge
    set against its reversal + a per-src partial agg. Returns
    (host, n_out, n_recip, recip_ratio)."""
    e = host_edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).distinct()
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b")).withColumn(
        "_r", F.lit(1)
    )
    return (
        e.join(rev, ["a", "b"], "left")
        .groupBy(F.col("a").alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_out"),
            F.sum(F.coalesce(F.col("_r"), F.lit(0))).alias("n_recip"),
        )
        .select(
            "host",
            "n_out",
            "n_recip",
            F.round(F.col("n_recip") / F.col("n_out"), 6).alias("recip_ratio"),
        )
    )


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact per-node triangle counts + local clustering coefficient over
    the UNDIRECTED simple graph underlying ``edges`` — the standard
    link-farm / community-density diagnostic next to ``degree_histogram``
    in a web-graph data card (spam clusters are near-cliques; genuine
    editorial neighborhoods are sparse).

    Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
    "Counting triangles and the curse of the last reducer", WWW 2011).
    Every undirected edge is oriented from its lower-(degree, id) endpoint
    to the higher, wedges are pivoted ONLY at the low end, and each
    candidate closing edge is probed with one semi-join. A degree-D hub
    therefore generates O(arboricity²) wedges instead of O(D²) — on a
    power-law web graph the difference between a tractable shuffle and a
    last-reducer blowup. Three equi-joins + two partial-agg censuses, all
    keyed on node/edge; no windows, no driver data.

    Returns (node, degree, triangles, clustering) for every node of the
    simple graph; clustering = 2T/(deg·(deg−1)), 0.0 when deg < 2.
    """
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y")).where(
        F.col("x") != F.col("y")
    )
    und = (
        e.select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        ).distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    arcs = (
        und.join(deg.select(F.col("node").alias("a"), F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("degree").alias("db")), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("arc")
        )
        .select("arc.u", "arc.v")
    )
    # wedges pivoted at the (degree,id)-min vertex; v < w keeps each
    # unordered wedge once, so every triangle is emitted exactly once
    wedges = (
        arcs.join(
            arcs.select(F.col("u").alias("u"), F.col("v").alias("w")),
            "u",
        )
        .where(F.col("v") < F.col("w"))
        .select("u", F.col("v").alias("a"), F.col("w").alias("b"))
    )
    tri = wedges.join(und, ["a", "b"], "left_semi")
    per_node = (
        tri.select(F.explode(F.array("u", "a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0
                    * F.coalesce("triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


def harmonic_centrality_2hop(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    reverse: bool = True,
) -> DataFrame:
    """Exact truncated harmonic centrality at radius 2: per node,
    n1 = |{nodes at distance exactly 1}|, n2 = |{distance exactly 2}|,
    harmonic2 = n1 + n2/2. With ``reverse=True`` (the default) distances
    run ALONG INCOMING edges — "how many pages are ≤2 clicks away from
    me", the authority flavor centrality rankings want; ``reverse=False``
    measures outward reach.

    This is the exact small-radius member of the neighborhood-function
    family; ``hyperball`` below is the any-radius approximate scale path
    (this one's distance-2 expansion joins through every hub, so its
    shuffle is Σ deg², fine for host graphs, wrong for 10^10 URL nodes).
    Two distinct-censuses + one self-join, all partial-agg.

    Returns (node, n1, n2, harmonic2) for every node with n1 > 0.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).where(
        F.col("s") != F.col("d")
    )
    if reverse:
        e = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    d1 = e.distinct()
    two = (
        d1.join(d1.select(F.col("s").alias("d"), F.col("d").alias("d2")), "d")
        .select("s", F.col("d2").alias("d"))
        .where(F.col("s") != F.col("d"))
        .distinct()
        .join(d1, ["s", "d"], "left_anti")
    )
    n1 = d1.groupBy(F.col("s").alias("node")).agg(F.count(F.lit(1)).alias("n1"))
    n2 = two.groupBy(F.col("s").alias("node")).agg(F.count(F.lit(1)).alias("n2"))
    return n1.join(n2, "node", "left").select(
        "node",
        "n1",
        F.coalesce("n2", F.lit(0)).alias("n2"),
        F.round(F.col("n1") + F.coalesce("n2", F.lit(0)) / 2.0, 6).alias("harmonic2"),
    )


def hyperball(
    edges: DataFrame,
    radius: int = 4,
    log2m: int = 6,
    src: str = "src",
    dst: str = "dst",
    reverse: bool = True,
) -> DataFrame:
    """HyperBall (Boldi & Vigna, "In-core computation of geometric
    centralities with HyperBall", ICDM 2013 workshops): the neighborhood
    function |B_r(v)| and truncated harmonic centrality for EVERY node at
    once, via one HyperLogLog counter per node iterated to radius
    ``radius``. THE way web-graph centralities are computed at 10^10
    nodes — exact all-pairs BFS is Θ(V·E); this is ``radius`` sweeps of
    one |E|-keyed join + one partial-agg max each.

    Spark shape: counters live EXPLODED as (node, register idx, rho) rows
    — sparse (a ball of size k sets ≤ min(k, m) registers), and the sweep
    union B(v) ∪= B(w) for v→w becomes groupBy(node, idx).max(rho), which
    is partial-aggregable, so hub in-degree never concentrates on one
    reducer (no collect_list of neighbor registers anywhere). State is
    ≤ V·m rows of 3 numbers; each sweep localCheckpoints to keep plans
    flat. Register hash is xxhash64(node) — deterministic across runs and
    parallelism levels.

    With ``reverse=True`` (default) balls grow along INCOMING edges, so
    harmonic_est ranks authorities (the convention for harmonic
    centrality); estimates use the HLL alpha_m bias correction + the
    small-range linear count. Relative error ≈ 1.04/√m (m=2^log2m, 13%
    at the default m=64); the exact siblings for verification are
    ``harmonic_centrality_2hop`` (radius 2) and brute-force BFS in tests.

    Returns (node, ball_est = |B_radius(v)| incl. v, harmonic_est =
    Σ_{t≤radius} (|B_t|−|B_{t−1}|)/t).
    """
    if not 4 <= log2m <= 12:
        raise ValueError("log2m must be in [4, 12]")
    m = 1 << log2m
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    else:
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}[m]
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).where(
        F.col("s") != F.col("d")
    )
    if reverse:
        e = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    e = e.distinct().persist()

    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
    )
    # one set register per node: idx = low log2m bits of xxhash64(node),
    # rho = (leading-zero count of the remaining 64−log2m-bit word) + 1
    width = 64 - log2m
    h = F.xxhash64(F.col("node").cast("string"))
    w = F.shiftrightunsigned(h, log2m)
    rho = (
        F.when(w == 0, F.lit(width + 1))
        .otherwise(F.lit(width) - F.floor(F.log2(w.cast("double"))))
        .cast("int")
    )
    state = nodes.select(
        "node",
        F.pmod(h, F.lit(m)).cast("int").alias("idx"),
        rho.alias("rho"),
    ).persist()

    def estimate(st: DataFrame) -> DataFrame:
        agg = st.groupBy("node").agg(
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_sum_set"),
            F.count(F.lit(1)).alias("_n_set"),
        )
        raw = F.lit(alpha * m * m) / (
            F.col("_sum_set") + (F.lit(m) - F.col("_n_set"))
        )
        zeros = F.lit(m) - F.col("_n_set")
        est = F.when(
            (raw < 2.5 * m) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
        ).otherwise(raw)
        return agg.select("node", est.alias("est"))

    acc = (
        estimate(state)
        .select("node", F.col("est").alias("_prev"), F.lit(0.0).alias("harmonic"))
        .localCheckpoint(eager=True)
    )
    for t in range(1, radius + 1):
        grown = (
            e.join(state.select(F.col("node").alias("d"), "idx", "rho"), "d")
            .select(F.col("s").alias("node"), "idx", "rho")
            .unionByName(state.select("node", "idx", "rho"))
            .groupBy("node", "idx")
            .agg(F.max("rho").alias("rho"))
        )
        new_state = grown.localCheckpoint(eager=True)
        state.unpersist()
        state = new_state
        est_t = estimate(state)
        acc = (
            acc.join(est_t, "node", "full")
            .select(
                "node",
                F.coalesce("est", "_prev").alias("_next_prev"),
                (
                    F.coalesce("harmonic", F.lit(0.0))
                    + F.greatest(
                        F.coalesce("est", "_prev") - F.coalesce("_prev", F.lit(0.0)),
                        F.lit(0.0),
                    )
                    / t
                ).alias("harmonic"),
            )
            .withColumnRenamed("_next_prev", "_prev")
            .localCheckpoint(eager=True)
        )
    out = acc.select(
        "node",
        F.round("_prev", 4).alias("ball_est"),
        F.round("harmonic", 4).alias("harmonic_est"),
    ).localCheckpoint(eager=True)
    state.unpersist()
    e.unpersist()
    return out


def cocitation_similarity(
    edges: DataFrame,
    direction: str = "in",
    min_common: int = 2,
    max_fanout: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Related-page discovery by co-citation (Dean & Henzinger, WWW 1999
    §3 "companion" precursor; Small 1973): two pages are similar when the
    same third pages link to BOTH. ``direction='in'`` pairs nodes sharing
    in-linkers (co-citation — the authority-side signal); ``'out'`` pairs
    nodes sharing out-links (bibliographic coupling, Kessler 1963 — the
    hub-side signal).

    Scale guard: pivoting at a linker with fanout D emits D² pairs, the
    same last-reducer curse as triangle wedges — and a 10^5-outlink
    directory page carries ~zero similarity signal per pair anyway
    (co-citation weight is informative the way rare terms are). Pivots
    with fanout > ``max_fanout`` are dropped BEFORE the self-join (the
    classic stop-word move), bounding the shuffle at |E|·max_fanout.
    Degrees for the jaccard are computed over the same capped edge set so
    the score stays a true set overlap.

    Two censuses + one self-join + one partial-agg pair census. Returns
    (a, b, common, jaccard) for pairs with common ≥ min_common, a < b.
    """
    if direction not in ("in", "out"):
        raise ValueError("direction must be 'in' or 'out'")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).where(
        F.col("s") != F.col("d")
    )
    if direction == "in":
        # pivot = the linking page, paired nodes = its link targets
        e = e.select(F.col("s").alias("pivot"), F.col("d").alias("node"))
    else:
        e = e.select(F.col("d").alias("pivot"), F.col("s").alias("node"))
    e = e.distinct()
    fanout = e.groupBy("pivot").agg(F.count(F.lit(1)).alias("_fan"))
    capped = e.join(
        fanout.where(F.col("_fan") <= max_fanout).select("pivot"), "pivot", "left_semi"
    )
    deg = capped.groupBy("node").agg(F.count(F.lit(1)).alias("_deg"))
    pairs = (
        capped.join(
            capped.select(F.col("pivot").alias("pivot"), F.col("node").alias("b")),
            "pivot",
        )
        .where(F.col("node") < F.col("b"))
        .select(F.col("node").alias("a"), "b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
    )
    return (
        pairs.join(deg.select(F.col("node").alias("a"), F.col("_deg").alias("_da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("_deg").alias("_db")), "b")
        .select(
            "a",
            "b",
            "common",
            F.round(
                F.col("common")
                / (F.col("_da") + F.col("_db") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )


def lpa_communities(
    edges: DataFrame,
    sweeps: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan,
    Albert & Kumara, Phys. Rev. E 2007) over the undirected graph:
    labels start as node ids; each sweep every node adopts the most
    frequent label among its NEIGHBORS, ties broken by the smallest
    label — fully deterministic (the paper's random tie-break is
    replaced so runs, parallelism levels, and the SQL oracle all agree).
    Communities ≙ link neighborhoods: the cheap first look at site
    clusters / link farms before paying for modularity methods.

    Per sweep: one |E|-keyed join + TWO partial-agg groupBys — the
    (node,label) vote census, then min_by over (−count, label) per node.
    No windows, no per-node label lists, so hub degree spreads across
    reducers. Fixed ``sweeps`` (synchronous LPA can 2-cycle on bipartite
    structure — a bounded sweep count is the standard remedy and keeps
    the operator oracle-unrollable); isolated or sink-free nodes keep
    their current label. Returns (node, community).
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    und = und.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")).distinct()
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("community", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(sweeps):
        votes = (
            sym.join(labels.select(F.col("node").alias("b"), "community"), "b")
            .groupBy(F.col("a").alias("node"), "community")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = votes.groupBy("node").agg(
            F.expr("min_by(community, struct(-cnt, community))").alias("_new")
        )
        labels = (
            labels.join(best, "node", "left")
            .select(
                "node", F.coalesce("_new", F.col("community")).alias("community")
            )
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    return labels


def reachable_from(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """Forward reachable set: every node with a directed path from any
    seed (seeds included). BFS frontier expansion — per sweep ONE
    |E|-keyed join + distinct + anti-join against the visited set, each
    shuffle keyed on the node id; stops when a sweep discovers nothing
    or at ``max_iters`` (each sweep advances one hop; callers bound the
    diameter, and the fixpoint check makes the bound a ceiling, not a
    truncation, on graphs that converge earlier). Visited set
    localCheckpointed per sweep — the CC lineage discipline. Returns
    one ``node`` column."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).persist()
    visited = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    visited = visited.localCheckpoint(eager=True)
    frontier = visited
    for _ in range(max_iters):
        nxt = (
            e.join(frontier.select(F.col("node").alias("s")), "s")
            .select(F.col("d").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    e.unpersist()
    return visited


def bowtie_classes(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """The Broder et al. (WWW 2000) bow-tie decomposition around a
    deterministic pivot — THE macroscopic map of a web crawl's link
    graph: a giant strongly-connected CORE, the IN set that can reach
    it (new sites not yet linked back), the OUT set it reaches (sinks,
    link farms' landing tiers), and everything else (tendrils +
    disconnected). Crawl use: seed selection (IN feeds the core),
    frontier triage (OUT-heavy growth means the crawl is draining into
    sinks), and the headline shape number every crawl census reports.

    pivot = the node with the highest total degree (ties: larger id) —
    deterministic, and on a bow-tie-shaped graph almost surely in the
    core. SCC(pivot) = forward-reachable ∩ backward-reachable (two
    `reachable_from` BFS runs, the backward one on reversed edges);
    IN = backward − SCC, OUT = forward − SCC, OTHER = the rest.
    Returns (node, cls ∈ {'scc','in','out','other'}).

    Note this is the PIVOT's SCC (the giant one, per the bow-tie
    assumption), not a full SCC enumeration — the global decomposition
    the census needs, at two-BFS cost instead of an SCC algorithm's."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    pivot = deg.orderBy(F.desc("deg"), F.desc("node")).limit(1).select("node")
    fwd = reachable_from(e, pivot, "src", "dst", max_iters).select(
        F.col("node"), F.lit(True).alias("_f")
    )
    bwd = reachable_from(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        pivot,
        "src",
        "dst",
        max_iters,
    ).select(F.col("node"), F.lit(True).alias("_b"))
    out = (
        nodes.join(fwd, "node", "left")
        .join(bwd, "node", "left")
        .select(
            "node",
            F.when(F.col("_f") & F.col("_b"), F.lit("scc"))
            .when(F.col("_b").isNotNull(), F.lit("in"))
            .when(F.col("_f").isNotNull(), F.lit("out"))
            .otherwise(F.lit("other"))
            .alias("cls"),
        )
    )
    nodes.unpersist()
    return out


def outlink_farms(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    host_col: str | None = None,
    min_pages: int = 3,
    min_hosts: int = 2,
    max_outdegree: int = 10_000,
) -> DataFrame:
    """Link-farm candidates via shared-outlink-set fingerprints: groups of
    pages whose DISTINCT outlink sets are byte-identical. Template-stamped
    spam farms generate thousands of pages pointing at the same boost
    targets (Fetterly/Manasse/Najork, "Spam, Damn Spam, and Statistics",
    WebDB 2004 — near-identical link structure is one of the strongest
    machine-generated-page signals; Gyöngyi & Garcia-Molina, "Link Spam
    Alliances", VLDB 2005). A frontier that demotes members of large
    cross-host farms starves the boost scheme; the spam_mass/trustrank
    operators score the TARGETS, this one catches the SOURCES.

    Output: one row per farm (farm_fp, n_pages, n_hosts, n_outlinks,
    first_src, cross_host) with n_pages ≥ min_pages; ``cross_host`` marks
    coordination across ≥ min_hosts distinct hosts (host_col optional —
    without it n_hosts counts distinct src, so cross_host degenerates to
    n_pages ≥ min_hosts).

    Scale shape: one groupBy-src building the sorted-distinct outlink
    fingerprint (md5 of the '|'-joined sorted set — engine-portable, and
    the downstream group key is 128 bits, never the list), then a
    partial-aggregable census per fingerprint. Pages with outdegree >
    max_outdegree are dropped BEFORE the set-collect: a 10^5-outlink page
    is a directory/sitemap, not a farm member, and its collect_set is the
    memory hot spot at census scale."""
    host = F.col(host_col) if host_col else F.col(src_col)
    per_src = (
        edges.groupBy(src_col)
        .agg(
            F.sort_array(F.collect_set(F.col(dst_col).cast("string"))).alias(
                "_outs"
            ),
            F.first(host).alias("_host"),
        )
        .filter(F.size("_outs") <= max_outdegree)
        .select(
            F.col(src_col).alias("_src"),
            "_host",
            F.md5(F.array_join("_outs", "|")).alias("farm_fp"),
            F.size("_outs").alias("_deg"),
        )
    )
    return (
        per_src.groupBy("farm_fp")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("_host").alias("n_hosts"),
            F.min("_deg").alias("n_outlinks"),
            F.min("_src").alias("first_src"),
        )
        .filter(F.col("n_pages") >= min_pages)
        .withColumn("cross_host", F.col("n_hosts") >= min_hosts)
    )
