"""Per-tick incremental maintenance pipeline — the standing-state story
proven as ONE composed job: each crawl tick updates a standing inverted
index (merge_postings) and a standing near-dup signature table
(minhash_signatures + minhash_probe_pairs) from ONLY that tick's new
captures, never rescanning or re-deduping the standing corpus.

The closing act is the differential that makes incremental maintenance
trustworthy at 10^10-URL scale, asserted in-process on every run:

- postings(incremental over ticks) == postings(batch over final corpus)
- near-dup pairs(union of per-tick probes) == pairs(batch LSH, same
  banding) — new×standing across ticks plus new×new within a tick
  covers every pair exactly once

Usage:
    python scripts/incremental_pipeline.py                  # one run, local[8]
    python scripts/incremental_pipeline.py --cores 32 --pages 200000
    python scripts/incremental_pipeline.py --scaling --n 2  # N vs 4N legs
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MINHASH_KW = dict(num_perm=32, bands=8, jaccard_threshold=0.5)


def run_pipeline(
    spark, pages_dir: str, n_hosts: int, ticks: int, budget: int, workdir: str
) -> dict:
    from pyspark.sql import functions as F

    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig
    from spider_spark.operators import dedup, index

    ledger: dict = {"ticks": [], "seconds": {}}
    pages = spark.read.parquet(pages_dir)
    n_pages = pages.count()
    robots = synth.generate_robots(spark, n_hosts)
    seeds = synth.seed_urls(n_pages, n_hosts, k=n_hosts, per_host=budget)
    cfg = CrawlConfig(
        per_host_budget=budget, max_ticks=ticks, tick_ms=120_000,
        store_text=True,
    )
    crawler = Crawler(spark, pages, f"{workdir}/ckpt", cfg, robots=robots)

    sig_schema = "id string, sig array<bigint>"
    post_dir, sig_dir, pair_dir = (
        f"{workdir}/postings", f"{workdir}/sigs", f"{workdir}/pairs"
    )
    total_fetched = 0
    t_crawl = t_index = t_dedup = 0.0
    for t in range(ticks):
        tick_row: dict = {"tick": t}
        t0 = time.monotonic()
        stats = crawler.run(seeds if t == 0 else None, max_ticks=t + 1)
        fetched = sum(s.fetched for s in stats)
        total_fetched += fetched
        tick_row["fetched"] = fetched
        t_crawl += time.monotonic() - t0

        new_docs = (
            crawler.catalog.load_results(spark, [t])
            .filter((F.col("status") == 200) & F.col("text").isNotNull())
            .select(F.col("url_canon").alias("doc_id"), "text")
            .filter(F.length(F.trim("text")) > 0)
        )

        # --- standing inverted index: anti-join old vs delta ids, union
        # freshly tokenized delta postings (shuffle ∝ delta) --------------
        t0 = time.monotonic()
        if t == 0:
            merged = index.postings(new_docs)
        else:
            old = spark.read.parquet(post_dir)
            merged = index.merge_postings(old, new_docs)
        merged.write.mode("overwrite").parquet(f"{post_dir}.next")
        _swap(post_dir)
        tick_row["postings_rows"] = spark.read.parquet(post_dir).count()
        t_index += time.monotonic() - t0

        # --- standing near-dup signatures + probe ------------------------
        # The signature table is APPENDED as per-tick delta dirs, never
        # rewritten in place: minhash_probe_pairs persists its inputs, and
        # a same-path overwrite would let the next tick's read canonicalize
        # to the stale cached plan (silently missing the newest sigs) —
        # besides, append-only deltas are the honest at-scale shape (the
        # catalog's seen-set compaction discipline).
        t0 = time.monotonic()
        new_sigs = dedup.minhash_signatures(
            new_docs, num_perm=MINHASH_KW["num_perm"]
        )
        new_sigs.write.mode("overwrite").parquet(f"{sig_dir}/tick={t}")
        new_sigs = spark.read.parquet(f"{sig_dir}/tick={t}").drop("tick")
        if t == 0:
            standing = spark.createDataFrame([], sig_schema)
        else:
            standing = spark.read.parquet(
                *[f"{sig_dir}/tick={i}" for i in range(t)]
            )
        pairs = dedup.minhash_probe_pairs(
            standing, new_sigs, max_bucket_size=None, **MINHASH_KW
        )
        pairs.write.mode("overwrite").parquet(f"{pair_dir}/tick={t}")
        tick_row["new_docs"] = new_sigs.count()
        tick_row["probe_pairs"] = (
            spark.read.parquet(f"{pair_dir}/tick={t}").count()
        )
        t_dedup += time.monotonic() - t0
        ledger["ticks"].append(tick_row)

    ledger["seconds"]["crawl"] = round(t_crawl, 2)
    ledger["seconds"]["index_merge"] = round(t_index, 2)
    ledger["seconds"]["dedup_probe"] = round(t_dedup, 2)

    # --- the equality differentials -------------------------------------
    t0 = time.monotonic()
    corpus = (
        crawler.results()
        .filter((F.col("status") == 200) & F.col("text").isNotNull())
        .select(F.col("url_canon").alias("doc_id"), "text")
        .filter(F.length(F.trim("text")) > 0)
    )
    batch_post = index.postings(corpus)
    inc_post = spark.read.parquet(post_dir)
    post_diff = (
        batch_post.unionByName(inc_post)
        .groupBy("doc_id", "term", "tf")
        .count()
        .filter("count <> 2")
        .count()
    )
    batch_pairs = dedup.minhash_near_duplicates(
        corpus, max_bucket_size=None, num_perm=MINHASH_KW["num_perm"],
        bands=MINHASH_KW["bands"],
        jaccard_threshold=MINHASH_KW["jaccard_threshold"],
    ).select("id_a", "id_b")
    inc_pairs = spark.read.parquet(pair_dir).select("id_a", "id_b")
    pair_diff = (
        batch_pairs.unionByName(inc_pairs)
        .groupBy("id_a", "id_b")
        .count()
        .filter("count <> 2")
        .count()
    )
    n_pairs = batch_pairs.count()
    if pair_diff:
        print(
            "DEBUG inc=", inc_pairs.count(), "batch=", n_pairs,
            "inc_only=", inc_pairs.join(batch_pairs, ["id_a", "id_b"], "left_anti").count(),
            "batch_only=", batch_pairs.join(inc_pairs, ["id_a", "id_b"], "left_anti").count(),
            file=sys.stderr,
        )
    ledger["seconds"]["equality_check"] = round(time.monotonic() - t0, 2)
    ledger["postings_equal_batch"] = post_diff == 0
    ledger["pairs_equal_batch"] = pair_diff == 0
    ledger["n_near_dup_pairs"] = n_pairs
    if post_diff or pair_diff:
        raise AssertionError(
            f"incremental != batch: postings diff {post_diff}, pair diff {pair_diff}"
        )

    total = round(sum(ledger["seconds"].values()), 2)
    ledger["total_seconds"] = total
    ledger["pages_in_corpus"] = n_pages
    ledger["fetched"] = total_fetched
    maint = ledger["seconds"]["index_merge"] + ledger["seconds"]["dedup_probe"]
    docs_total = sum(r["new_docs"] for r in ledger["ticks"])
    ledger["docs_maintained"] = docs_total
    ledger["maintain_docs_per_sec"] = (
        round(docs_total / maint, 1) if maint else None
    )
    ledger["fetched_urls_per_sec"] = (
        round(total_fetched / ledger["seconds"]["crawl"], 1)
        if ledger["seconds"]["crawl"]
        else None
    )
    return ledger


def _swap(path: str) -> None:
    """next-generation snapshot swap (crash-safe enough for a bench
    script; the engine's catalog uses the full generation discipline)."""
    import shutil

    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(f"{path}.next", path)


def main_one(args):
    from spider_spark import synth
    from spider_spark.session import get_spark

    spark = get_spark(
        app_name=f"incremental-pipeline-{args.cores}", cpus=args.cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="incr-") as tmp:
        pages_dir = args.pages_dir
        if pages_dir is None:
            pages_dir = f"{tmp}/pages"
            synth.generate_pages(
                spark, args.pages, n_hosts=args.hosts,
                body_words=args.body_words, extra_links=args.extra_links,
            ).repartition(64, "url").write.parquet(pages_dir)
        report = run_pipeline(
            spark, pages_dir, args.hosts, args.ticks, args.budget, tmp
        )
        report["cores"] = args.cores
        print(json.dumps(report))
    spark.stop()


def main_scaling(args):
    """Same job at local[N] and local[4N] — fresh JVM per run, shared
    pre-generated corpus, best-of-K per leg (interference only ever slows
    a run). Throughput metric: maintained docs/sec over the incremental
    stages (the per-tick standing-state work the pipeline exists for)."""
    from spider_spark import synth
    from spider_spark.session import get_spark

    gen_tmp = tempfile.mkdtemp(prefix="incr-scaling-")
    pages_dir = f"{gen_tmp}/pages"
    gen = get_spark(app_name="incr-gen", cpus=32)
    gen.sparkContext.setLogLevel("ERROR")
    synth.generate_pages(
        gen, args.pages, n_hosts=args.hosts,
        body_words=args.body_words, extra_links=args.extra_links,
    ).repartition(64, "url").write.mode("overwrite").parquet(pages_dir)
    gen.stop()
    results = {}
    first = True
    for cores in (args.n, 4 * args.n):
        best = None
        for _ in range(args.runs_per_leg):
            if not first:
                time.sleep(60)
            first = False
            env = dict(os.environ)
            env.setdefault("SPARK_DRIVER_MEMORY", "48g")
            cmd = [
                sys.executable, __file__, "--cores", str(cores),
                "--pages", str(args.pages), "--hosts", str(args.hosts),
                "--ticks", str(args.ticks), "--budget", str(args.budget),
                "--pages-dir", pages_dir,
                "--body-words", str(args.body_words),
                "--extra-links", str(args.extra_links),
            ]
            out = subprocess.run(
                cmd, capture_output=True, text=True, env=env, check=True
            )
            line = [
                l for l in out.stdout.strip().splitlines() if l.startswith("{")
            ][-1]
            r = json.loads(line)
            if best is None or r["maintain_docs_per_sec"] > best["maintain_docs_per_sec"]:
                best = r
        results[cores] = best
    n, n4 = args.n, 4 * args.n
    eff = (
        results[n4]["maintain_docs_per_sec"]
        / results[n]["maintain_docs_per_sec"]
        / 4.0
    )
    print(json.dumps({
        "metric": "incremental maintenance scaling efficiency N->4N",
        "N": n, "4N": n4,
        "tput_N_docs_per_sec": results[n]["maintain_docs_per_sec"],
        "tput_4N_docs_per_sec": results[n4]["maintain_docs_per_sec"],
        "efficiency": round(eff, 3),
        "pages": args.pages,
        "detail": results,
    }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--n", type=int, default=2)
    p.add_argument("--pages", type=int, default=120_000)
    p.add_argument("--hosts", type=int, default=800)
    p.add_argument("--ticks", type=int, default=3)
    p.add_argument("--budget", type=int, default=48)
    p.add_argument("--pages-dir", type=str, default=None)
    p.add_argument("--body-words", type=int, default=400)
    p.add_argument("--extra-links", type=int, default=40)
    p.add_argument("--runs-per-leg", type=int, default=2)
    a = p.parse_args()
    if a.scaling:
        main_scaling(a)
    else:
        main_one(a)
