"""Iceberg-style snapshot catalog over partitioned parquet.

No Iceberg/Delta jars ship in this sandbox, so the catalog implements the
same discipline — immutable per-tick snapshot dirs + an atomically-replaced
manifest — on plain parquet. Swapping in real Iceberg later means replacing
``commit_tick``/``load_*`` bodies with MERGE/snapshot reads; the engine code
above this layer does not change.

Layout under ``root/``::

    manifest.json              {"committed_tick": N, "metrics": {tick: {...}}}
    frontier/tick=K/*.parquet  frontier state entering tick K
    seen/tick=K/*.parquet      url_seen delta added at tick K (cumulative = union)
    results/tick=K/*.parquet   fetch+extract output of tick K

Crash-consistency: a tick's dirs are fully written before the manifest is
replaced (os.replace is atomic), so a killed run resumes at the last
committed tick without refetching or double-emitting (the north rule's
resume requirement).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# latest_capture row: the per-URL "what do we know about the last crawl"
# snapshot (VERDICT r02 next #1). One row per url_canon; (tick, seq,
# status, committed_at) describe the LAST capture of any status, the ok_*
# triple the last status-200 capture (nullable — a URL may never have
# succeeded). Deltas are politeness-bounded (one row per URL fetched in
# the tick); compaction folds them exactly like the seen set, so
# revalidation reads O(compact_every) dirs instead of the full ledger.
LATEST_SCHEMA = StructType(
    [
        StructField("url_canon", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("tick", IntegerType(), False),
        StructField("seq", StringType(), True),
        StructField("status", IntegerType(), True),
        StructField("committed_at", DoubleType(), True),
        StructField("ok_tick", IntegerType(), True),
        StructField("ok_seq", StringType(), True),
        StructField("ok_fp", LongType(), True),
    ]
)


# standing inverted-index snapshot row: doc_id is the url_canon
INDEX_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("tf", LongType(), False),
    ]
)


class CrawlCatalog:
    def __init__(self, root: str):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    @property
    def _manifest_path(self) -> Path:
        return self.root / "manifest.json"

    def manifest(self) -> dict:
        if self._manifest_path.exists():
            return json.loads(self._manifest_path.read_text())
        return {"committed_tick": -1, "metrics": {}}

    def seen_compacted_at(self) -> int:
        """Highest tick whose seen deltas have been folded into one
        compacted snapshot (-1 = none)."""
        return self.manifest().get("seen_compacted_at", -1)

    def committed_tick(self) -> int:
        return self.manifest()["committed_tick"]

    def _dir(self, kind: str, tick: int) -> str:
        return str(self.root / kind / f"tick={tick}")

    def write_bootstrap(self, frontier: DataFrame, seen_delta: DataFrame) -> None:
        """Tick-0 state: seed frontier + its seen delta (not yet committed)."""
        frontier.write.mode("overwrite").parquet(self._dir("frontier", 0))
        seen_delta.write.mode("overwrite").parquet(self._dir("seen", 0))

    def write_results(self, tick: int, results: DataFrame) -> None:
        """Results inherit the parse stage's partitioning (no extra
        shuffle); they are re-read once, column-pruned, by the frontier
        stage."""
        results.write.mode("overwrite").parquet(self._dir("results", tick))

    def append_results(self, tick: int, rows: DataFrame) -> None:
        """Second writer into a tick's results dir (e.g. the 404 ledger) —
        append-mode, so the hits snapshot written first is untouched."""
        rows.write.mode("append").parquet(self._dir("results", tick))

    def write_frontier(self, tick: int, frontier: DataFrame) -> None:
        """AQE REBALANCE sizes snapshot files by bytes, not by
        shuffle.partitions — without it each tick emits hundreds of tiny
        files and every later tick pays a scan task per file (the classic
        small-files death at 10^10-URL scale)."""
        frontier.hint("rebalance").write.mode("overwrite").parquet(self._dir("frontier", tick))

    def append_frontier(self, tick: int, rows: DataFrame) -> None:
        """Second writer into a tick's frontier dir (e.g. a recrawl
        policy's requeued URLs) — append-mode, so the committed frontier
        snapshot is untouched."""
        rows.write.mode("append").parquet(self._dir("frontier", tick))

    def write_seen_delta(self, tick: int, seen_delta: DataFrame) -> None:
        seen_delta.hint("rebalance").write.mode("overwrite").parquet(self._dir("seen", tick))

    def write_lineage(self, tick: int, lineage: DataFrame) -> None:
        """Per-partition lineage rows for a tick (north rule: frontier,
        seen shards, AND per-partition lineage/metrics are all checkpointed
        state): which physical partition produced how many rows of which
        status, bounded by the politeness budget — the audit trail that
        lets a resumed run prove no partition's output was lost or
        double-committed."""
        lineage.write.mode("overwrite").parquet(self._dir("lineage", tick))

    def write_host_state(self, tick: int, state: DataFrame) -> None:
        """Adaptive-politeness AIMD state ENTERING ``tick`` — one
        (host, budget) row per host observed so far. Tiny (≤ #hosts);
        written before the previous tick's manifest commit like every
        other tick dir, so a killed run resumes with the same budgets."""
        state.write.mode("overwrite").parquet(self._dir("host_state", tick))

    def load_host_state(self, spark: SparkSession, tick: int) -> DataFrame | None:
        """(host, budget) state entering ``tick``; None when the crawl has
        no adaptive state yet (tick 0, or the feature was off)."""
        p = self.root / "host_state" / f"tick={tick}"
        if not p.exists():
            return None
        from .operators.adaptive import HOST_STATE_SCHEMA

        return spark.read.schema(HOST_STATE_SCHEMA).parquet(str(p))

    def write_retry_state(self, tick: int, state: DataFrame) -> None:
        """Transient-failure retry state ENTERING ``tick`` — one row per
        URL awaiting a backoff retry (operators/recrawl.retry_state_schema).
        Bounded by the failure rate, not the frontier; written before the
        previous tick's commit like host_state, so a killed run resumes
        with the same pending retries."""
        state.write.mode("overwrite").parquet(self._dir("retry_state", tick))

    def load_retry_state(self, spark: SparkSession, tick: int) -> DataFrame | None:
        """Retry state entering ``tick``; None when there is none yet
        (tick 0, or cfg.retry_transient was off)."""
        p = self.root / "retry_state" / f"tick={tick}"
        if not p.exists():
            return None
        from .operators.recrawl import retry_state_schema

        return spark.read.schema(retry_state_schema()).parquet(str(p))

    def load_lineage(self, spark: SparkSession, ticks: list[int] | None = None) -> DataFrame:
        base = self.root / "lineage"
        if ticks is None:
            ticks = sorted(int(p.name.split("=")[1]) for p in base.glob("tick=*"))
        return spark.read.parquet(*[str(base / f"tick={k}") for k in ticks])

    def write_accel(self, kind: str, tick: int, shards: DataFrame) -> None:
        """Seen-accelerator shard snapshot entering ``tick`` — one
        (shard, payload) row per shard, checkpointed like any other tick
        state. ``kind`` is "bloom" or "cuckoo" (separate dirs, so a run
        that switches accelerator kinds never reads the wrong blob
        format)."""
        shards.write.mode("overwrite").parquet(self._dir(kind, tick))

    def load_accel(self, spark: SparkSession, kind: str, tick: int) -> DataFrame | None:
        p = self.root / kind / f"tick={tick}"
        if not p.exists():
            return None
        return spark.read.parquet(str(p))

    def replace_accel(self, kind: str, tick: int, shards: DataFrame) -> None:
        """Rewrite an accelerator snapshot whose own dir feeds ``shards``'s
        plan (e.g. in-place cuckoo deletion): write to a side dir first,
        then swap via rmtree + atomic rename. Kill-safe because the
        accelerator is reconstructible cache state — a kill after the
        rmtree leaves no dir, which the crawler treats as "rebuild from
        the full seen set"; a kill before it leaves the stale snapshot,
        whose over-claiming maybe-hits the exact anti-join resolves."""
        target = Path(self._dir(kind, tick))
        side = target.with_name(target.name + "__new")
        shards.write.mode("overwrite").parquet(str(side))
        shutil.rmtree(target, ignore_errors=True)
        os.rename(side, target)

    def write_bloom(self, tick: int, bloom: DataFrame) -> None:
        self.write_accel("bloom", tick, bloom)

    def load_bloom(self, spark: SparkSession, tick: int) -> DataFrame | None:
        return self.load_accel(spark, "bloom", tick)

    def write_tick_data(
        self,
        tick: int,
        results: DataFrame,
        next_frontier: DataFrame,
        seen_delta: DataFrame,
    ) -> None:
        """Persist tick outputs (not yet visible to resume)."""
        self.write_results(tick, results)
        self.write_frontier(tick + 1, next_frontier)
        self.write_seen_delta(tick + 1, seen_delta)

    def commit(self, tick: int, metrics: dict) -> None:
        """Atomically advance the manifest — the snapshot-commit point. A
        kill before this line resumes at the previous tick; after it, at
        this one. (Iceberg's commit protocol, minus the jar.)"""
        m = self.manifest()
        m["committed_tick"] = tick
        m["metrics"][str(tick)] = metrics
        tmp = self._manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(m, indent=1))
        os.replace(tmp, self._manifest_path)

    def commit_tick(
        self,
        tick: int,
        results: DataFrame,
        next_frontier: DataFrame,
        seen_delta: DataFrame,
        metrics: dict,
    ) -> None:
        """Persist tick outputs, then atomically advance the manifest."""
        self.write_tick_data(tick, results, next_frontier, seen_delta)
        self.commit(tick, metrics)

    def load_frontier(self, spark: SparkSession, tick: int) -> DataFrame:
        p = Path(self._dir("frontier", tick))
        if not p.exists():
            # recover from a kill inside replace_frontier's swap window:
            # the backup IS the pre-replace frontier, losing only the
            # optimization that was being applied
            bak = p.with_name(p.name + "__bak")
            if bak.exists():
                os.rename(bak, p)
        return spark.read.parquet(str(p))

    def replace_frontier(self, tick: int, frontier: DataFrame) -> None:
        """Rewrite a pending frontier snapshot whose own dir feeds
        ``frontier``'s plan (e.g. a priority rerank). Unlike the
        accelerator (reconstructible cache), the frontier is PRIMARY state
        — so the swap writes the side dir first, keeps the old snapshot as
        ``__bak`` until the new one is renamed into place, and
        ``load_frontier`` falls back to the backup if a kill lands between
        the two renames. Every window leaves a complete snapshot readable."""
        target = Path(self._dir("frontier", tick))
        side = target.with_name(target.name + "__new")
        bak = target.with_name(target.name + "__bak")
        frontier.write.mode("overwrite").parquet(str(side))
        shutil.rmtree(bak, ignore_errors=True)
        os.rename(target, bak)
        os.rename(side, target)
        shutil.rmtree(bak)

    def load_seen(self, spark: SparkSession, up_to_tick: int) -> DataFrame:
        """Cumulative url_seen = compacted snapshot (deltas ≤ C folded into
        one dir) ∪ per-tick deltas in (C, up_to_tick]. Without periodic
        compaction the anti-join re-lists K snapshot dirs every tick — fine
        for 10 ticks, a metadata death at hundreds (VERDICT r01 #7)."""
        dirs: list[str] = []
        c = self.seen_compacted_at()
        if c >= 0 and c <= up_to_tick:
            dirs.append(str(self.root / "seen_compact" / self._compact_dir_name()))
            lo = c + 1
        else:
            lo = 0
        base = self.root / "seen"
        dirs += [
            str(base / f"tick={k}")
            for k in range(lo, up_to_tick + 1)
            if (base / f"tick={k}").exists()
        ]
        # each dir is passed as a leaf path (no basePath): the tick is not
        # needed downstream, so no partition-column inference required
        return spark.read.parquet(*dirs).select("url_hash", "url_canon", "seq")

    def compact_seen(self, spark: SparkSession, up_to_tick: int) -> None:
        """Fold all seen deltas ≤ up_to_tick into one rebalanced snapshot
        dir. Crash-safe: the compacted dir is written FIRST, the manifest
        pointer flips atomically, and only then are the folded delta dirs
        garbage-collected — a kill at any point resumes correctly (either
        pointer state reads a complete set)."""
        self.rewrite_seen(spark, up_to_tick, self.load_seen(spark, up_to_tick))

    def _compact_dir_name(self) -> str | None:
        """Current compact snapshot dir name (generation-suffixed so a
        rewrite at the SAME tick never overwrites the dir its own input
        plan is lazily reading from)."""
        m = self.manifest()
        c = m.get("seen_compacted_at", -1)
        if c < 0:
            return None
        gen = m.get("seen_compact_gen", 0)
        return f"tick={c}" if gen == 0 else f"tick={c}.g{gen}"

    def rewrite_seen(self, spark: SparkSession, up_to_tick: int, snap: DataFrame) -> None:
        """Replace the cumulative seen set ≤ up_to_tick with ``snap`` (the
        compaction primitive, also used by ``Crawler.forget_urls`` to
        remove URLs). Crash-safe: the new snapshot dir (a fresh,
        generation-suffixed path — never the dir ``snap`` reads from) is
        written FIRST, the manifest pointer flips atomically, and only then
        are superseded dirs garbage-collected."""
        prev_dir = self._compact_dir_name()
        gen = self.manifest().get("seen_compact_gen", 0) + 1
        new_dir = f"tick={up_to_tick}.g{gen}"
        snap.hint("rebalance").write.mode("overwrite").parquet(
            str(self.root / "seen_compact" / new_dir)
        )
        m = self.manifest()
        m["seen_compacted_at"] = up_to_tick
        m["seen_compact_gen"] = gen
        tmp = self._manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(m, indent=1))
        os.replace(tmp, self._manifest_path)
        # gc: folded delta dirs and the superseded compact snapshot
        for k in range(up_to_tick + 1):
            shutil.rmtree(self.root / "seen" / f"tick={k}", ignore_errors=True)
        if prev_dir is not None and prev_dir != new_dir:
            shutil.rmtree(self.root / "seen_compact" / prev_dir, ignore_errors=True)

    def load_results(self, spark: SparkSession, ticks: list[int] | None = None) -> DataFrame:
        base = self.root / "results"
        if ticks is None:
            ticks = sorted(int(p.name.split("=")[1]) for p in base.glob("tick=*"))
        # no basePath: result files carry their own `tick` column, so
        # partition-column discovery would clash with it.
        # EXPLICIT schema (not inference from the first file): the ledger
        # schema has grown across engine versions (content_fp arrived in
        # r02) and varies with cfg.store_text — a mixed-schema checkpoint
        # must read deterministically, with absent columns as nulls, never
        # "whatever the first footer says" (ADVICE r02 #2).
        from .frontier import RESULTS_SCHEMA

        return spark.read.schema(RESULTS_SCHEMA).parquet(
            *[str(base / f"tick={k}") for k in ticks]
        )

    # --- latest_capture snapshot (per-URL last-crawl state) -----------------

    def write_latest_delta(self, tick: int, delta: DataFrame) -> None:
        """Per-tick latest_capture delta: one LATEST_SCHEMA row per URL
        captured in ``tick`` (politeness-bounded — tiny next to the
        ledger). Idempotent per tick (overwrite), written before the
        manifest commit like every other tick dir."""
        delta.write.mode("overwrite").parquet(self._dir("latest", tick))

    def latest_compacted_at(self) -> int:
        return self.manifest().get("latest_compacted_at", -1)

    def _latest_compact_dir_name(self) -> str | None:
        m = self.manifest()
        c = m.get("latest_compacted_at", -1)
        if c < 0:
            return None
        gen = m.get("latest_compact_gen", 0)
        return f"tick={c}" if gen == 0 else f"tick={c}.g{gen}"

    @staticmethod
    def _aggregate_latest(raw: DataFrame) -> DataFrame:
        """Fold LATEST_SCHEMA rows (deltas ∪ compact snapshot — the compact
        rows are themselves valid LATEST_SCHEMA rows) down to one row per
        URL: the max over the data-derived (tick, seq) key for the last
        capture, and over (ok_tick, ok_seq) for the last success. A
        map-side-combinable agg — never a window."""
        last = F.max(F.struct("tick", "seq", "status", "committed_at")).alias("_l")
        ok = F.max(
            F.when(
                F.col("ok_tick").isNotNull(), F.struct("ok_tick", "ok_seq", "ok_fp")
            )
        ).alias("_o")
        return (
            raw.groupBy("url_canon")
            .agg(F.max("url_hash").alias("url_hash"), last, ok)
            .select(
                "url_canon",
                "url_hash",
                F.col("_l.tick").alias("tick"),
                F.col("_l.seq").alias("seq"),
                F.col("_l.status").alias("status"),
                F.col("_l.committed_at").alias("committed_at"),
                F.col("_o.ok_tick").alias("ok_tick"),
                F.col("_o.ok_seq").alias("ok_seq"),
                F.col("_o.ok_fp").alias("ok_fp"),
            )
        )

    def load_latest_capture(self, spark: SparkSession, up_to_tick: int) -> DataFrame:
        """One row per crawled URL: last capture (any status) + last
        successful capture. Reads the compacted snapshot plus the per-tick
        deltas since it — O(compact_every) dirs, NEVER the results ledger
        (the r02 full-history-shuffle-per-revalidation scale killer)."""
        dirs: list[str] = []
        c = self.latest_compacted_at()
        if c >= 0 and c <= up_to_tick:
            dirs.append(str(self.root / "latest_compact" / self._latest_compact_dir_name()))
            lo = c + 1
        else:
            lo = 0
        base = self.root / "latest"
        dirs += [
            str(base / f"tick={k}")
            for k in range(lo, up_to_tick + 1)
            if (base / f"tick={k}").exists()
        ]
        if not dirs:
            return spark.createDataFrame([], LATEST_SCHEMA)
        return self._aggregate_latest(spark.read.schema(LATEST_SCHEMA).parquet(*dirs))

    def rewrite_latest(self, spark: SparkSession, up_to_tick: int) -> None:
        """Fold latest deltas ≤ up_to_tick into one compacted snapshot —
        the same crash-safe generation discipline as ``rewrite_seen``:
        fresh generation-suffixed dir written FIRST, manifest pointer flips
        atomically, superseded dirs garbage-collected last."""
        snap = self.load_latest_capture(spark, up_to_tick)
        prev_dir = self._latest_compact_dir_name()
        gen = self.manifest().get("latest_compact_gen", 0) + 1
        new_dir = f"tick={up_to_tick}.g{gen}"
        snap.hint("rebalance").write.mode("overwrite").parquet(
            str(self.root / "latest_compact" / new_dir)
        )
        m = self.manifest()
        m["latest_compacted_at"] = up_to_tick
        m["latest_compact_gen"] = gen
        tmp = self._manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(m, indent=1))
        os.replace(tmp, self._manifest_path)
        for k in range(up_to_tick + 1):
            shutil.rmtree(self.root / "latest" / f"tick={k}", ignore_errors=True)
        if prev_dir is not None and prev_dir != new_dir:
            shutil.rmtree(self.root / "latest_compact" / prev_dir, ignore_errors=True)

    def ensure_latest(self, spark: SparkSession) -> None:
        """Backfill the latest_capture snapshot for a checkpoint created
        before it existed (or whose deltas were lost): one full-ledger pass
        — the scan r02 paid on EVERY revalidation call — written out as the
        compacted snapshot, after which revalidation reads only it."""
        t = self.committed_tick()
        if t < 0 or self.latest_compacted_at() >= 0:
            return
        if any((self.root / "latest").glob("tick=*")):
            return
        m = self.manifest().get("metrics", {})
        times = [(int(k), float(v.get("committed_at", 0.0))) for k, v in m.items()]
        tick_times = spark.createDataFrame(
            times or [(-1, 0.0)], "tick int, committed_at double"
        )
        res = self.load_results(spark).select(
            "url_canon", "url_hash", "tick", "seq", "status", "content_fp"
        )
        delta = res.join(F.broadcast(tick_times), "tick", "left").select(
            "url_canon",
            "url_hash",
            "tick",
            "seq",
            "status",
            F.coalesce("committed_at", F.lit(0.0)).alias("committed_at"),
            F.when(F.col("status") == 200, F.col("tick")).alias("ok_tick"),
            F.when(F.col("status") == 200, F.col("seq")).alias("ok_seq"),
            F.when(F.col("status") == 200, F.col("content_fp")).alias("ok_fp"),
        )
        snap = self._aggregate_latest(delta)
        gen = 1
        new_dir = f"tick={t}.g{gen}"
        snap.hint("rebalance").write.mode("overwrite").parquet(
            str(self.root / "latest_compact" / new_dir)
        )
        mm = self.manifest()
        mm["latest_compacted_at"] = t
        mm["latest_compact_gen"] = gen
        tmp = self._manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(mm, indent=1))
        os.replace(tmp, self._manifest_path)

    # --- incremental postings index snapshot ---------------------------------

    def index_built_at(self) -> int:
        """Highest tick whose captures are folded into the postings
        snapshot (-1 = no index yet)."""
        return self.manifest().get("index_built_at", -1)

    def _index_dir_name(self) -> str | None:
        m = self.manifest()
        b = m.get("index_built_at", -1)
        if b < 0:
            return None
        return f"tick={b}.g{m.get('index_gen', 0)}"

    def load_index(self, spark: SparkSession) -> DataFrame:
        """The standing postings table (term, doc_id=url_canon, tf) —
        empty with the right schema before the first update_index()."""
        d = self._index_dir_name()
        if d is None:
            return spark.createDataFrame([], INDEX_SCHEMA)
        return spark.read.schema(INDEX_SCHEMA).parquet(str(self.root / "index" / d))

    def replace_index(self, tick: int, post: DataFrame) -> None:
        """Swap in an updated postings snapshot — the same crash-safe
        generation discipline as ``rewrite_latest``: the new
        generation-suffixed dir is fully written FIRST (its plan may read
        the dir being superseded), the manifest pointer flips atomically,
        the superseded dir is garbage-collected last."""
        prev = self._index_dir_name()
        gen = self.manifest().get("index_gen", 0) + 1
        new_dir = f"tick={tick}.g{gen}"
        post.hint("rebalance").write.mode("overwrite").parquet(
            str(self.root / "index" / new_dir)
        )
        m = self.manifest()
        m["index_built_at"] = tick
        m["index_gen"] = gen
        tmp = self._manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(m, indent=1))
        os.replace(tmp, self._manifest_path)
        if prev is not None and prev != new_dir:
            shutil.rmtree(self.root / "index" / prev, ignore_errors=True)

    def destroy(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
