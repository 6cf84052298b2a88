"""Driver-side crawl loop: tick iteration, checkpointing, resume.

Generalizes the reference's only iterative dataflow (TreeScraper.scrape,
src/scrapers/tree.ts:280-410): loop until the frontier is empty or the tick
budget is exhausted, with early exit mirroring tree.ts:162-167's
"2 consecutive empty iterations" rule. Each tick is checkpoint-bounded
(read parquet → plan → write parquet) so lineage never accumulates and a
killed run resumes at the last committed tick without refetching — the
distributed form of the reference's read-through cache (src/shared/cache.ts).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import CrawlCatalog
from .frontier import (
    CrawlConfig,
    FRONTIER_SCHEMA,
    blocked_projection,
    extract_new_links,
    fetch_and_parse,
    finalize_frontier,
    politeness_select,
    results_projection,
    seeds_to_frontier,
)


@dataclass
class TickStats:
    tick: int
    fetched: int
    ok: int
    missing: int
    blocked: int
    deferred: int
    new_urls: int
    seconds: float


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        checkpoint_dir: str,
        cfg: CrawlConfig | None = None,
        robots: DataFrame | None = None,
    ):
        self.spark = spark
        self.pages = pages
        self.cfg = cfg or CrawlConfig()
        self.robots = robots
        self.catalog = CrawlCatalog(checkpoint_dir)

    def bootstrap(self, seed_urls: list[str]) -> None:
        frontier = seeds_to_frontier(self.spark, seed_urls, self.cfg)
        self.catalog.write_bootstrap(frontier, frontier.select("url_hash", "url_canon", "seq"))

    def run(self, seed_urls: list[str] | None = None, max_ticks: int | None = None) -> list[TickStats]:
        """Run (or resume) the crawl. Returns per-tick stats. Total fetch
        count across bootstrap+resume never exceeds a fresh run's — the
        no-refetch invariant is tested in tests/test_crawler.py."""
        max_ticks = max_ticks if max_ticks is not None else self.cfg.max_ticks
        start_tick = self.catalog.committed_tick() + 1
        if start_tick == 0:
            if seed_urls is None:
                raise ValueError("fresh crawl needs seed_urls")
            self.bootstrap(seed_urls)
        stats: list[TickStats] = []
        empty_streak = 0
        for tick in range(start_tick, max_ticks):
            st = self.run_tick(tick)
            stats.append(st)
            if st.fetched == 0:
                empty_streak += 1
                if empty_streak >= 2:  # tree.ts:162-167 termination rule
                    break
            else:
                empty_streak = 0
        return stats

    def run_tick(self, tick: int) -> TickStats:
        t0 = time.monotonic()
        spark, cfg = self.spark, self.cfg
        frontier = self.catalog.load_frontier(spark, tick)
        seen = self.catalog.load_seen(spark, tick)

        selected, deferred, blocked = politeness_select(frontier, cfg, self.robots)
        parsed = fetch_and_parse(selected, self.pages, cfg)
        # one pass over parsed feeds both results and link extraction
        parsed = parsed.persist()
        try:
            results = results_projection(parsed, cfg, tick)
            if blocked is not None:
                results = results.unionByName(blocked_projection(blocked, cfg, tick))
            new = extract_new_links(parsed, seen, cfg, tick)
            next_frontier = finalize_frontier(new, deferred, cfg)

            seen_delta = new.select("url_hash", "url_canon", "seq")
            self.catalog.commit_tick(
                tick,
                results,
                next_frontier,
                seen_delta,
                metrics={},
            )
            # stats from the committed snapshots (one small agg each)
            res = spark.read.parquet(self.catalog._dir("results", tick))
            counts = res.agg(
                F.sum(F.when(F.col("status") != 451, 1).otherwise(0)).alias("fetched"),
                F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("ok"),
                F.sum(F.when(F.col("status") == 404, 1).otherwise(0)).alias("missing"),
                F.sum(F.when(F.col("status") == 451, 1).otherwise(0)).alias("blocked"),
            ).first()
            new_count = spark.read.parquet(self.catalog._dir("seen", tick + 1)).count()
            deferred_count = (
                spark.read.parquet(self.catalog._dir("frontier", tick + 1)).count() - new_count
            )
            st = TickStats(
                tick=tick,
                fetched=counts["fetched"] or 0,
                ok=counts["ok"] or 0,
                missing=counts["missing"] or 0,
                blocked=counts["blocked"] or 0,
                deferred=deferred_count,
                new_urls=new_count,
                seconds=time.monotonic() - t0,
            )
            # fold the true metrics into the committed manifest
            m = self.catalog.manifest()
            m["metrics"][str(tick)] = {
                k: getattr(st, k) for k in ("fetched", "ok", "missing", "blocked", "deferred", "new_urls", "seconds")
            }
            import json as _json
            import os as _os

            tmp = self.catalog._manifest_path.with_suffix(".tmp")
            tmp.write_text(_json.dumps(m, indent=1))
            _os.replace(tmp, self.catalog._manifest_path)
            return st
        finally:
            parsed.unpersist()

    # --- inspection helpers -------------------------------------------------

    def results(self) -> DataFrame:
        return self.catalog.load_results(self.spark)

    def seen(self) -> DataFrame:
        return self.catalog.load_seen(self.spark, self.catalog.committed_tick() + 1)

    def crawl_order(self) -> DataFrame:
        """The deterministic global fetch order: (tick, priority, seq) —
        data-derived keys only, so it is identical at any parallelism."""
        return self.results().orderBy("tick", "priority", "seq")
