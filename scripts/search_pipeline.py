"""End-to-end search-stack pipeline at bench scale — the indexing/serving
story proven as ONE composed job, the search-side counterpart of
scripts/curation_pipeline.py:

    trap-guarded politeness crawl → standing inverted index
    (Crawler.update_index, incremental merge) → index sizing
    (postings vbyte + dictionary front coding) → known-item query set
    (5 lowest-df tokens of sampled docs — the classic known-item eval)
    → whole-batch top-10 retrieval in ONE plan (index.batch_bm25_topk
    over the materialized impact index; equality-checked per query
    against exact BM25 AND MaxScore on a sample) → TREC eval
    (MRR / recall@10) against the planted known items

The report is one JSON object on stdout: per-stage wall seconds, index
size estimates, retrieval quality, query throughput. ``--scaling`` runs
the whole pipeline at local[N] and local[4N] on the same pre-generated
corpus (fresh JVMs, best-of-K per leg) and prints the efficiency — the
north-rule evidence for the serving half, like curation_pipeline does
for the cleaning half.

Usage:
    python scripts/search_pipeline.py                      # one run, local[8]
    python scripts/search_pipeline.py --cores 32 --pages 200000
    python scripts/search_pipeline.py --scaling --n 2
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


def run_pipeline(
    spark,
    pages_dir: str,
    n_hosts: int,
    ticks: int,
    budget: int,
    workdir: str,
    n_queries: int,
    equality_sample: int,
) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig
    from spider_spark.operators import index as ix

    ledger: dict = {"stages": {}, "seconds": {}}

    def tick(name, t0):
        ledger["seconds"][name] = round(time.monotonic() - t0, 2)
        return time.monotonic()

    pages = spark.read.parquet(pages_dir)
    n_pages = pages.count()
    robots = synth.generate_robots(spark, n_hosts)

    # --- stage 1: politeness crawl ------------------------------------------
    t0 = time.monotonic()
    cfg = CrawlConfig(
        per_host_budget=budget, max_ticks=ticks, tick_ms=120_000,
        store_text=True, trap_guard=True,
    )
    crawler = Crawler(spark, pages, f"{workdir}/ckpt", cfg, robots=robots)
    seeds = synth.seed_urls(n_pages, n_hosts, k=n_hosts, per_host=budget)
    stats = crawler.run(seeds, max_ticks=ticks)
    fetched = sum(s.fetched for s in stats)
    ok = sum(s.ok for s in stats)
    ledger["stages"]["crawl"] = {"ticks": len(stats), "fetched": fetched, "ok": ok}
    t0 = tick("crawl", t0)

    # --- stage 2: standing inverted index ------------------------------------
    crawler.update_index()
    post = crawler.catalog.load_index(spark)
    n_post = post.count()
    n_terms = post.select("term").distinct().count()
    ledger["stages"]["index"] = {"postings": n_post, "distinct_terms": n_terms}
    t0 = tick("index_build", t0)

    # --- stage 3: index sizing estimates -------------------------------------
    docs = (
        crawler.results()
        .filter("status = 200")
        .groupBy("url_canon")
        .agg(F.max_by("text", F.struct("tick", "seq")).alias("text"))
        .select(F.col("url_canon").alias("doc_id"), "text")
        .persist()
    )
    n_docs = docs.count()
    # the vbyte estimator gaps NUMERIC doc ids; crawl docs key on url
    # strings — a deterministic hash surrogate is the id an index shard
    # would assign, and sizing only needs the gap distribution
    numbered = docs.select(
        F.pmod(F.xxhash64("doc_id"), F.lit(1 << 40)).alias("doc_no"), "text"
    )
    vb = ix.postings_compression_stats(numbered, bucket_bits=4, id_col="doc_no")
    vb_tot = vb.agg(
        F.sum("raw_bytes").alias("raw"), F.sum("vbyte_bytes").alias("vb")
    ).collect()[0]
    fc = ix.dictionary_frontcoding_stats(docs, bucket_chars=2).collect()[0]
    ledger["stages"]["sizing"] = {
        "docs": n_docs,
        "postings_raw_bytes": int(vb_tot["raw"] or 0),
        "postings_vbyte_bytes": int(vb_tot["vb"] or 0),
        "dict_raw_bytes": int(fc["raw_bytes"]),
        "dict_frontcoded_bytes": int(fc["coded_bytes"]),
    }
    t0 = tick("sizing", t0)

    # --- stage 4: known-item query set ---------------------------------------
    # every (n_docs // n_queries)-th doc (by sorted doc_id) is a known item;
    # its query = its 5 lowest-df tokens (distinctive, deterministic)
    postings = ix.postings(docs, "doc_id", "text")
    dfreq = ix.document_frequency(postings)
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("term").asc())
    ranked_terms = (
        postings.join(dfreq, "term")
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= 5)
        .groupBy("doc_id")
        .agg(F.array_join(F.sort_array(F.collect_list("term")), " ").alias("q"))
    )
    wq = Window.orderBy("doc_id")
    stride = max(1, n_docs // n_queries)
    qdocs = (
        ranked_terms.withColumn("_i", F.row_number().over(wq))
        .where((F.col("_i") % stride == 0) & (F.col("_i") / stride <= n_queries))
        .select(
            (F.col("_i") / stride).cast("long").alias("query_id"),
            F.col("doc_id").alias("known_doc"),
            "q",
        )
    )
    queries = [(r["query_id"], r["known_doc"], r["q"]) for r in qdocs.collect()]
    ledger["stages"]["queries"] = {"n_queries": len(queries)}
    t0 = tick("query_gen", t0)

    # --- stage 5: BATCH retrieval from the materialized impact index ---------
    # the serving shape: (doc, term, bm25_r) computed ONCE next to the
    # postings; the WHOLE query batch scores in one plan
    # (index.batch_bm25_topk) — query-at-a-time loops pay one driver
    # round-trip of pure latency per query, the Amdahl serial term that
    # capped this stage's scaling before the batch operator existed
    ix.bm25_scores(docs).write.mode("overwrite").parquet(f"{workdir}/impact")
    impact = spark.read.parquet(f"{workdir}/impact")
    t0 = tick("impact_index", t0)
    qframe = spark.createDataFrame(
        [(int(qid), q) for qid, _, q in queries], "query_id long, q string"
    )
    results = ix.batch_bm25_topk(impact, qframe, k=10)
    results.write.mode("overwrite").parquet(f"{workdir}/results")
    results = spark.read.parquet(f"{workdir}/results")
    t0 = tick("retrieval", t0)
    # equality sample (timed separately — deliberately query-at-a-time):
    # the batch plan vs per-query exact BM25 AND per-query MaxScore —
    # three independent paths must agree row-for-row
    n_equal = 0
    for qid, known, q in queries[:equality_sample]:
        got = [
            (r["doc_id"], r["score_r"])
            for r in results.where(F.col("query_id") == int(qid))
            .orderBy("rank")
            .collect()
        ]
        exact = [
            (r["doc_id"], r["score_r"])
            for r in ix.bm25_search(docs, q, k=10).collect()
        ]
        pruned = [
            (r["doc_id"], r["score_r"])
            for r in ix.maxscore_topk(docs, q, k=10, scores=impact).collect()
        ]
        if got == exact == pruned:
            n_equal += 1
    ledger["stages"]["retrieval"] = {
        "equality_checked": min(equality_sample, len(queries)),
        "equality_matched": n_equal,
    }
    t0 = tick("equality_check", t0)

    # --- stage 6: TREC eval vs the planted known items ------------------------
    qrels = spark.createDataFrame(
        [(int(qid), known, 1) for qid, known, _ in queries],
        "query_id long, doc_id string, rel int",
    )
    per_q = ix.retrieval_eval(results, qrels, k=10)
    summ = ix.retrieval_eval_summary(per_q).collect()[0]
    ledger["stages"]["eval"] = {k: summ[k] for k in summ.asDict()}
    tick("eval", t0)

    docs.unpersist()
    total = round(sum(ledger["seconds"].values()), 2)
    ledger["total_seconds"] = total
    ledger["pages_in_corpus"] = n_pages
    ledger["fetched_urls_per_sec"] = round(fetched / ledger["seconds"]["crawl"], 1)
    retr = ledger["seconds"]["retrieval"]
    ledger["queries_per_sec"] = round(len(queries) / retr, 2) if retr else None
    return ledger


def main_one(args):
    from spider_spark import synth
    from spider_spark.session import get_spark

    spark = get_spark(app_name=f"search-pipeline-{args.cores}", cpus=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="searchpipe-") as tmp:
        pages_dir = args.pages_dir
        if pages_dir is None:
            pages_dir = f"{tmp}/pages"
            synth.generate_pages(
                spark, args.pages, n_hosts=args.hosts,
                body_words=args.body_words, extra_links=args.extra_links,
            ).repartition(64, "url").write.parquet(pages_dir)
        report = run_pipeline(
            spark, pages_dir, args.hosts, args.ticks, args.budget, tmp,
            args.queries, args.equality_sample,
        )
        report["cores"] = args.cores
        print(json.dumps(report))
    spark.stop()


def main_scaling(args):
    """local[N] vs local[4N], same pre-generated corpus, fresh JVMs,
    best-of-K per leg; efficiency on query throughput AND crawl."""
    from spider_spark import synth
    from spider_spark.session import get_spark

    gen_tmp = tempfile.mkdtemp(prefix="search-scaling-")
    pages_dir = f"{gen_tmp}/pages"
    gen = get_spark(app_name="search-gen", cpus=32)
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
                "--queries", str(args.queries),
                "--equality-sample", str(args.equality_sample),
            ]
            out = subprocess.run(cmd, capture_output=True, text=True, env=env, check=True)
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            if best is None or r["queries_per_sec"] > best["queries_per_sec"]:
                best = r
        results[cores] = best
    n, n4 = args.n, 4 * args.n
    eff = results[n4]["queries_per_sec"] / results[n]["queries_per_sec"] / 4.0
    crawl_eff = results[n4]["fetched_urls_per_sec"] / results[n]["fetched_urls_per_sec"] / 4.0
    print(json.dumps({
        "metric": "search pipeline scaling efficiency N->4N",
        "N": n, "4N": n4,
        "tput_N_queries_per_sec": results[n]["queries_per_sec"],
        "tput_4N_queries_per_sec": results[n4]["queries_per_sec"],
        "efficiency": round(eff, 3),
        "crawl_stage_efficiency": round(crawl_eff, 3),
        "pages": args.pages,
        "detail": results,
    }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--n", type=int, default=2)
    p.add_argument("--pages", type=int, default=200_000)
    p.add_argument("--hosts", type=int, default=1000)
    p.add_argument("--ticks", type=int, default=2)
    p.add_argument("--budget", type=int, default=64)
    p.add_argument("--pages-dir", type=str, default=None)
    p.add_argument("--body-words", type=int, default=400)
    p.add_argument("--extra-links", type=int, default=40)
    p.add_argument("--queries", type=int, default=20)
    p.add_argument("--equality-sample", type=int, default=5)
    p.add_argument("--runs-per-leg", type=int, default=2)
    a = p.parse_args()
    if a.scaling:
        main_scaling(a)
    else:
        main_one(a)
