"""spark-submit entry point for the distributed crawl.

Cluster usage (the north-rule invocation):

    cd /root/repo && zip -r /tmp/spider_spark.zip spider_spark
    spark-submit --py-files /tmp/spider_spark.zip \\
        scripts/submit_crawl.py \\
        --pages hdfs://…/pages --checkpoint hdfs://…/ckpt \\
        --seeds-file hdfs://…/seeds.txt --ticks 20 --budget 64

Local smoke (same code path, local master):

    python scripts/submit_crawl.py --synth-pages 20000 --synth-hosts 100 \\
        --checkpoint /tmp/ckpt --ticks 3

The job builds no SparkSession config of its own beyond sane defaults —
master/executors/memory come from spark-submit, so the same script runs at
N and 4N executors unchanged. Per-tick metrics land in the checkpoint
manifest; the job prints one JSON line at the end.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _peak_rss_mb() -> dict:
    """Kernel-tracked peak resident set (VmHWM) of this Python driver and
    of its JVM children — in local mode that IS the executor memory, so a
    bounded reading here evidences 'memory bounded' for the stress audit
    without any sampling thread."""
    import os
    import re

    def hwm(pid: str) -> int | None:
        try:
            text = Path(f"/proc/{pid}/status").read_text()
        except OSError:
            return None
        m = re.search(r"VmHWM:\s+(\d+) kB", text)
        return int(m.group(1)) // 1024 if m else None

    me = str(os.getpid())
    out = {"python_mb": hwm(me)}
    jvm = []
    for p in Path("/proc").iterdir():
        if not p.name.isdigit():
            continue
        try:
            stat = (p / "stat").read_text()
            comm = (p / "comm").read_text().strip()
        except OSError:
            continue
        ppid = stat.rsplit(")", 1)[1].split()[1]
        if ppid == me and "java" in comm:
            v = hwm(p.name)
            if v is not None:
                jvm.append(v)
    out["jvm_mb"] = max(jvm) if jvm else None
    return out


def _audit(spark, checkpoint: str) -> dict:
    """Post-hoc resume-invariant audit over the whole checkpoint: every
    result snapshot and seen delta/compact dir is re-read and the run is
    held to 0 duplicate fetches and 0 duplicate (url_hash, url_canon)
    pairs (the collision-proof pair identity). Also reports the anti-join
    read amplification a NEXT tick would pay: how many seen dirs load_seen
    would list (compaction keeps this O(compact_every), never O(ticks))."""
    from pyspark.sql import functions as F

    from spider_spark.catalog import CrawlCatalog

    cat = CrawlCatalog(checkpoint)
    tick = cat.committed_tick()
    results = cat.load_results(spark)
    res_rows = results.count()
    dup_fetch = (
        results.groupBy("url_canon").count().where(F.col("count") > 1).count()
    )
    # the post-run seen state is tick+1 (the final tick writes the NEXT
    # tick's delta before committing, and end-of-run compaction may fold
    # it) — the same coordinate the crawler itself resumes/requeues at
    seen = cat.load_seen(spark, tick + 1)
    seen_rows = seen.count()
    dup_pairs = (
        seen.groupBy("url_hash", "url_canon").count().where(F.col("count") > 1).count()
    )
    c = cat.seen_compacted_at()
    delta_dirs = sum(
        1
        for k in range(c + 1, tick + 2)
        if (Path(checkpoint) / "seen" / f"tick={k}").exists()
    )
    return {
        "committed_tick": tick,
        "result_rows": res_rows,
        "duplicate_fetches": dup_fetch,
        "seen_rows": seen_rows,
        "duplicate_seen_pairs": dup_pairs,
        "seen_compacted_at": c,
        "seen_dirs_next_antijoin": (1 if c >= 0 else 0) + delta_dirs,
        "peak_rss": _peak_rss_mb(),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", help="path to the pages table (url, warc_ts, html, text, lang)")
    p.add_argument("--robots", help="optional robots table path")
    p.add_argument("--redirects", help="optional redirects table path")
    p.add_argument("--seeds-file", help="newline-delimited seed URL file")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--ticks", type=int, default=10)
    p.add_argument("--budget", type=int, default=16)
    p.add_argument("--tick-ms", type=int, default=60_000)
    p.add_argument("--max-requests", type=int, default=None)
    p.add_argument("--use-bloom", action="store_true")
    p.add_argument("--use-cuckoo", action="store_true")
    p.add_argument(
        "--bloom-bits-per-shard",
        type=int,
        default=None,
        help="size the sharded bloom for the expected seen-set cardinality "
        "(64 shards; ~10 bits/key keeps the prefilter effective — the "
        "test-scale default 2^20 saturates above ~5M URLs)",
    )
    p.add_argument(
        "--cuckoo-buckets-per-shard",
        type=int,
        default=None,
        help="size the sharded cuckoo (64 shards x buckets x 4 slots; keep "
        "load factor under ~0.95 of total slots)",
    )
    p.add_argument(
        "--compact-seen-every",
        type=int,
        default=None,
        help="fold seen deltas into one snapshot every M ticks "
        "(CrawlConfig.compact_seen_every; default keeps the config's own 8)",
    )
    p.add_argument(
        "--audit",
        action="store_true",
        help="after the run, re-read the checkpoint and assert the resume "
        "invariants: 0 duplicate fetches across all result snapshots, 0 "
        "duplicate (url_hash, url_canon) seen pairs, and report seen-dir "
        "read amplification + peak process RSS",
    )
    p.add_argument(
        "--rerank-every",
        type=int,
        default=None,
        help="PageRank-rerank frontier priorities every N ticks (priority "
        "scheduling from the crawled link graph; Crawler.rerank_frontier)",
    )
    p.add_argument("--synth-pages", type=int, help="generate a synthetic corpus of N pages instead of --pages")
    p.add_argument("--synth-hosts", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    import os

    spark = (
        SparkSession.builder.appName("spider-spark-crawl")
        # spark-submit supplies memory on a cluster; the local smoke path
        # otherwise runs on the 1g default and OOMs Arrow at ~1M+ pages
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    robots = redirects = None
    if args.synth_pages:
        n_hosts = args.synth_hosts or max(16, args.synth_pages // 150)
        # materialize the corpus once (hash-distributed on url — the
        # engine's storage contract) so ticks scan files, not the generator
        pages_dir = str(Path(args.checkpoint) / "_synth_pages")
        # the generator is deterministic in (n_pages, n_hosts), so a resume
        # on the same checkpoint reuses the corpus it crawled before the
        # kill instead of spending the regeneration again. The geometry is
        # stamped in a sidecar so a resume with DIFFERENT --synth-pages /
        # --synth-hosts regenerates instead of silently crawling the stale
        # corpus (ADVICE r04).
        meta_path = Path(pages_dir) / "_synth_meta.json"
        stamp = {"n_pages": args.synth_pages, "n_hosts": n_hosts}
        reusable = (Path(pages_dir) / "_SUCCESS").exists()
        if reusable:
            try:
                reusable = json.loads(meta_path.read_text()) == stamp
            except (OSError, ValueError):
                reusable = False
        if not reusable:
            synth.generate_pages(spark, args.synth_pages, n_hosts=n_hosts).repartition(
                64, "url"
            ).write.mode("overwrite").parquet(pages_dir)
            meta_path.write_text(json.dumps(stamp))
        pages = spark.read.parquet(pages_dir)
        robots = synth.generate_robots(spark, n_hosts)
        redirects = synth.generate_redirects(spark, args.synth_pages, n_hosts)
        seeds = synth.seed_urls(args.synth_pages, n_hosts, k=min(64, n_hosts))
    else:
        if not args.pages:
            p.error("--pages or --synth-pages required")
        pages = spark.read.parquet(args.pages)
        if args.robots:
            robots = spark.read.parquet(args.robots)
        if args.redirects:
            redirects = spark.read.parquet(args.redirects)
        seeds = None
        if args.seeds_file:
            seeds = [
                line.strip()
                for line in spark.read.text(args.seeds_file).toPandas()["value"]
                if line.strip()
            ]

    cfg_kwargs = dict(
        per_host_budget=args.budget,
        max_ticks=args.ticks,
        tick_ms=args.tick_ms,
        max_requests=args.max_requests,
        use_bloom=args.use_bloom,
        use_cuckoo=args.use_cuckoo,
    )
    if args.compact_seen_every is not None:
        cfg_kwargs["compact_seen_every"] = args.compact_seen_every
    if args.bloom_bits_per_shard is not None:
        cfg_kwargs["bloom_bits_per_shard"] = args.bloom_bits_per_shard
    if args.cuckoo_buckets_per_shard is not None:
        cfg_kwargs["cuckoo_buckets_per_shard"] = args.cuckoo_buckets_per_shard
    cfg = CrawlConfig(**cfg_kwargs)
    crawler = Crawler(spark, pages, args.checkpoint, cfg, robots=robots, redirects=redirects)
    t0 = time.monotonic()
    if args.rerank_every:
        # run in chunks, reranking the pending frontier between them; the
        # 2-empty-tick early exit applies per chunk (each chunk that
        # fetches nothing ends the loop below anyway)
        stats = []
        while True:
            start = crawler.catalog.committed_tick() + 1
            if start >= args.ticks:
                break
            chunk = crawler.run(seeds, max_ticks=min(args.ticks, start + args.rerank_every))
            stats.extend(chunk)
            if not chunk or sum(s.fetched for s in chunk) == 0:
                break
            if crawler.catalog.committed_tick() + 1 < args.ticks:
                crawler.rerank_frontier()
    else:
        stats = crawler.run(seeds, max_ticks=args.ticks)
    dt = time.monotonic() - t0
    fetched = sum(s.fetched for s in stats)
    line = {
        "ticks_run": len(stats),
        "fetched": fetched,
        "seconds": round(dt, 2),
        "urls_per_sec": round(fetched / dt, 1) if dt else None,
        "per_tick": [
            {"tick": s.tick, "fetched": s.fetched, "new_urls": s.new_urls, "sec": round(s.seconds, 1)}
            for s in stats
        ],
    }
    exit_code = 0
    if args.audit:
        line["audit"] = audit = _audit(spark, args.checkpoint)
        # --audit promises to ASSERT the invariants, not just report them:
        # a violated run must fail the process so automated stress harnesses
        # can't pass on a duplicated crawl (ADVICE r04)
        if audit["duplicate_fetches"] or audit["duplicate_seen_pairs"]:
            line["audit_failed"] = True
            exit_code = 2
    print(json.dumps(line))
    spark.stop()
    if exit_code:
        sys.exit(exit_code)


if __name__ == "__main__":
    main()
