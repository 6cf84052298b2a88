"""Crawl-ordering quality evaluation (Cho, Garcia-Molina & Page 1998,
"Efficient Crawling Through URL Ordering").

A crawler that fetches 1% of the web should fetch the BEST 1%. The paper's
measure: run the crawl, then plot the cumulative fraction of total page
value (PageRank, in-degree, relevance — any per-URL importance) captured
after each step. A good ordering's curve dominates breadth-first's; the
normalized area under the curve compresses the comparison to one scalar
(0.5 ≈ value-blind, →1 as high-value pages front-load).

This evaluates orderings the engine already produces — the tick ledger
from `Crawler.run` under `rerank_frontier` (PageRank-first), OPIC, or
plain BFS — against any value table (`graph.pagerank`, `graph.opic`,
anchor relevance…).

Scale shape (100 TB): the ledger joins the value table on url (both
url-keyed; broadcast when the value side is a top-slice), then partial-
aggregates to ONE ROW PER (ordering, tick) before any window — the
cumulative sums run over #orderings × #ticks rows, never per-URL. No
collect, no global per-URL sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["crawl_order_quality", "ordering_auc"]


def crawl_order_quality(
    ledger: DataFrame,
    values: DataFrame,
    url_col: str = "url",
    tick_col: str = "tick",
    value_col: str = "value",
    ordering_col: str | None = None,
) -> DataFrame:
    """Per-tick cumulative value curve for one or many crawl orderings.

    ledger: one row per fetched URL with the tick it was fetched in
    (and an ordering label column when comparing runs); values: per-URL
    importance (URLs absent from it count 0 — unvalued discoveries).
    Output per (ordering?, tick): n_fetched, cum_fetched, cum_value_r,
    cum_value_frac_r (of the ordering's own total fetched value)."""
    keys = ([ordering_col] if ordering_col else []) + [tick_col]
    j = ledger.join(
        values.select(
            F.col(url_col), F.col(value_col).cast("double").alias("_v")
        ),
        url_col,
        "left",
    ).withColumn("_v", F.coalesce(F.col("_v"), F.lit(0.0)))
    per_tick = j.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_fetched"), F.sum("_v").alias("_tv")
    )
    w = (
        Window.partitionBy(ordering_col)
        if ordering_col
        else Window.partitionBy(F.lit(0))
    ).orderBy(tick_col)
    wt = (
        Window.partitionBy(ordering_col)
        if ordering_col
        else Window.partitionBy(F.lit(0))
    ).orderBy(tick_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_v = F.sum("_tv").over(w)
    tot_v = F.sum("_tv").over(wt)
    return per_tick.select(
        *keys,
        "n_fetched",
        F.sum("n_fetched").over(w).cast("long").alias("cum_fetched"),
        F.round(cum_v, 6).alias("cum_value_r"),
        F.round(
            F.when(tot_v > 0, cum_v / tot_v).otherwise(F.lit(0.0)), 6
        ).alias("cum_value_frac_r"),
    )


def ordering_auc(
    curve: DataFrame,
    tick_col: str = "tick",
    ordering_col: str | None = None,
) -> DataFrame:
    """One scalar per ordering: the mean of cum_value_frac over ticks —
    the (right-endpoint) normalized area under the Cho et al. curve.
    Equal-width ticks assumed (the crawl's own clock). 0.5 ≈ value-blind
    uniform capture; higher = value front-loaded. One partial agg over
    the already-tiny curve frame."""
    keys = [ordering_col] if ordering_col else []
    return curve.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("int").alias("n_ticks"),
        F.round(F.avg("cum_value_frac_r"), 6).alias("auc_r"),
    )


def outlink_novelty(
    captures: DataFrame,
    seen: DataFrame,
    src_col: str = "url",
    link_col: str = "link",
    seen_col: str = "url_canon",
) -> DataFrame:
    """Frontier-yield signal per captured page: what fraction of its
    outlinks lead somewhere NEW. (src, n_links, n_novel, novelty_r).

    Hub pages whose outlinks are mostly unseen are where the next tick's
    discoveries come from; pages whose outlinks are all already-seen are
    exhausted (IRLbot's budget-by-yield and OPIC both chase this signal —
    this is its direct measurement from the last tick's captures, usable
    as a prior on the hosts/pages the scheduler expands first).

    ``captures`` has one row per (page, outlink), with a NULL link row
    for pages that had no outlinks (the shape an explode_outer of the
    links column produces); ``seen`` is the canonical seen-set
    projection. Novel = left_anti against seen on the link. Distinct
    outlinks counted once (keep-first discipline); zero-outlink pages
    surface with n_links 0 and novelty 0.0, not dropped — an exhausted
    page IS the signal.

    Scale shape: distinct (src, link) → ONE left_anti keyed on the link
    (the same join discipline as the frontier's new_links anti-join,
    co-locatable with the seen snapshot's layout) → two partial-agg
    counts keyed on src. No window, no collect."""
    srcs = captures.select(F.col(src_col).alias("_src")).distinct()
    links = (
        captures.select(
            F.col(src_col).alias("_src"), F.col(link_col).alias("_dst")
        )
        .filter(F.col("_dst").isNotNull())
        .distinct()
    )
    seen_keys = seen.select(F.col(seen_col).alias("_dst")).distinct()
    novel = links.join(seen_keys, "_dst", "left_anti")
    totals = links.groupBy("_src").agg(F.count(F.lit(1)).alias("n_links"))
    novels = novel.groupBy("_src").agg(F.count(F.lit(1)).alias("n_novel"))
    n_links = F.coalesce("n_links", F.lit(0))
    n_novel = F.coalesce("n_novel", F.lit(0))
    return (
        srcs.join(totals, "_src", "left")
        .join(novels, "_src", "left")
        .select(
            F.col("_src").alias("src"),
            n_links.alias("n_links"),
            n_novel.alias("n_novel"),
            F.round(
                F.when(n_links > 0, n_novel / n_links).otherwise(F.lit(0.0)),
                6,
            ).alias("novelty_r"),
        )
    )
