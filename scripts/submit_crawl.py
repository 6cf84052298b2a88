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
        synth.generate_pages(spark, args.synth_pages, n_hosts=n_hosts).repartition(
            64, "url"
        ).write.mode("overwrite").parquet(pages_dir)
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

    cfg = CrawlConfig(
        per_host_budget=args.budget,
        max_ticks=args.ticks,
        tick_ms=args.tick_ms,
        max_requests=args.max_requests,
        use_bloom=args.use_bloom,
    )
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
    print(
        json.dumps(
            {
                "ticks_run": len(stats),
                "fetched": fetched,
                "seconds": round(dt, 2),
                "urls_per_sec": round(fetched / dt, 1) if dt else None,
                "per_tick": [
                    {"tick": s.tick, "fetched": s.fetched, "new_urls": s.new_urls, "sec": round(s.seconds, 1)}
                    for s in stats
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
