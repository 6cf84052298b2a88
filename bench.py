"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall seconds over the headline queries; the crawl
throughput (the north-star metric, URLs fetched+extracted/sec) is reported
under ``crawl_urls_per_sec``.

Scaling mode (north rule evidence): ``python bench.py --scaling`` runs the
same crawl job in fresh JVMs at local[N] and local[4N] on identical
pre-generated input (best of ``--runs-per-leg`` per leg — external
interference only ever slows a run) and prints throughput at both plus
efficiency = (tput_4N / tput_N) / 4 (≥0.8 target). Default N=2: this box
has 16 physical cores + SMT, and each Spark core runs a JVM task thread
AND a Python UDF worker, so legs beyond local[8] oversubscribe physical
cores and measure SMT, not the engine (see BENCH.md §1).
``--crawl-only --cores N`` is the subprocess entry for one leg.
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

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def _sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.0


def run_crawl(
    spark,
    n_pages: int,
    n_hosts: int,
    ticks: int,
    budget: int = 16,
    body_words: int = 800,
    extra_links: int = 80,
    tick_ms: int = 60_000,
    steady_state: bool = True,
    pages_dir: str | None = None,
    cache_pages: bool = True,
    profile_out: dict | None = None,
):
    """One measured crawl: returns (urls_fetched_and_extracted, seconds).

    Pages are Common-Crawl-like and materialized (written+read) first so
    generation cost is not billed to the crawl; pass ``pages_dir`` to reuse
    a pre-generated corpus (the scaling harness generates once and points
    both legs at the same files). ``steady_state`` seeds ``budget`` pages
    per host so tick 0 already runs at the politeness cap — the regime a
    10^10-URL frontier is always in."""
    from spider_spark import synth
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    with tempfile.TemporaryDirectory() as tmp:
        if pages_dir is None:
            pages_dir = f"{tmp}/pages"
            # hash-distribute on url — the engine's storage contract: a
            # host-contiguous layout skews the fetch stage (politeness
            # selects ≤budget/host, so per-split hit rates vary 100×)
            synth.generate_pages(
                spark, n_pages, n_hosts=n_hosts, body_words=body_words, extra_links=extra_links
            ).repartition(64, "url").write.parquet(pages_dir)
        # the pages table emulates the NETWORK — caching it avoids re-decoding
        # the corpus parquet each tick, but only helps while it fits in heap;
        # past that the GC/spill thrash serializes everything, so big corpora
        # run uncached (the scan is parallel work that scales with cores)
        pages = spark.read.parquet(pages_dir)
        if cache_pages:
            pages = pages.persist()
            pages.count()
        robots = synth.generate_robots(spark, n_hosts)
        cfg = CrawlConfig(per_host_budget=budget, max_ticks=ticks, tick_ms=tick_ms, store_text=True)
        crawler = Crawler(spark, pages, f"{tmp}/ckpt", cfg, robots=robots)
        if profile_out is not None:
            _wrap_catalog_timers(crawler.catalog, profile_out)
        seeds = synth.seed_urls(
            n_pages, n_hosts, k=n_hosts, per_host=budget if steady_state else 1
        )
        t0 = time.monotonic()
        stats = crawler.run(seeds, max_ticks=ticks)
        dt = time.monotonic() - t0
        fetched = sum(s.fetched for s in stats)
        if profile_out is not None:
            profile_out["tick_seconds"] = [round(s.seconds, 2) for s in stats]
        if cache_pages:
            pages.unpersist()
        return fetched, dt


def _wrap_catalog_timers(catalog, out: dict) -> None:
    """Instrument the snapshot catalog so a scaling leg reports where tick
    wall-time goes (``--profile``): per-stage total seconds, keyed by the
    catalog call. Pure driver-side wrappers — each catalog call is exactly
    one Spark action, so the wall time around it IS that stage's cost."""
    import functools

    stages = out.setdefault("stages", {})
    for name in (
        "write_bootstrap", "write_results", "append_results",
        "write_latest_delta", "write_lineage", "write_frontier",
        "write_seen_delta", "write_accel", "write_host_state",
        "compact_seen", "rewrite_latest", "load_frontier", "load_seen",
    ):
        fn = getattr(catalog, name, None)
        if fn is None:
            continue

        def make(fn=fn, name=name):
            @functools.wraps(fn)
            def timed(*a, **kw):
                t0 = time.monotonic()
                try:
                    return fn(*a, **kw)
                finally:
                    stages[name] = round(
                        stages.get(name, 0.0) + time.monotonic() - t0, 2
                    )
            return timed

        setattr(catalog, name, make())


def headline_queries(spark, sf_dir: str) -> dict[str, float]:
    """Headline per-query wall seconds at sf_dir."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [
        "metrics_rollup_q1",
        "orders_per_nation",
        "politeness_topk_per_host",
        "keep_first_dedupe",
        "token_counts",
        "quality_flags",
        "lang_id",
        "exact_dedupe_stats",
        "minhash_near_dups",
        "simhash_near_dups",
        "similarity_topk_cosine",
        "lsh_topk_ann",
        "events_hourly_rollup",
        "scrape_document_text_branch",
        "scrape_document_download_branch",
        "platform_detect",
        "platform_fetch_items",
        "tree_scrape_metrics",
        "simhash_deterministic",
        "cache_read_through_misses",
        "ivf_topk_ann",
        "repetition_signals",
        "boilerplate_ngrams",
        "warc_roundtrip",
        "sitemap_extract",
        "dup_clusters",
        "pagerank_2iter",
        "clean_corpus",
        "line_dedup_c4",
        "embedding_near_dups_exact",
        "pii_redact",
        "sitemap_revalidation",
        "gopher_quality",
        "c4_line_filters",
        "url_prefetch_filters",
        # round 3 additions
        "multimodal_png_decode",
        "dup_ngram_coverage",
        "quality_classifier_score",
        "dsir_importance_weights",
        "adaptive_host_budgets",
        "charset_decode",
        "host_reputation",
        "anchor_text_rollup",
        "semdedup_clusters",
        "prototype_prune",
        "retrieval_eval_ndcg",
        "ip_politeness_topk",
        "layout_scan_locality",
        "token_mixture_plan",
        "mixture_materialize",
        "meta_robots_directives",
        "remove_dup_spans",
        "bff_paragraph_dedupe",
        "main_content_extract",
        "wet_roundtrip",
        "wat_extract",
        "multimodal_gif_decode",
        "multimodal_jpeg_decode",
        "video_frame_sample_gif",
        "video_container_meta",
        "feed_extract",
        "feed_discovery",
        "cdx_lookup_latest",
        "http_freshness",
        "sequence_pack_chunks",
        "pack_bins_ffd",
        "shard_manifest",
        "unicode_nfc",
        "mojibake_repair",
        "nb_langid_train_score",
        "corpus_datacard",
        "mirror_hosts",
        "soft404_screen",
        "snapshot_diff",
        "url_alias_clusters",
        "registered_domain_rollup",
        "opic_2sweep",
        "tfidf_top_terms",
        "hits_2iter",
        "trustrank_2iter",
        "crawl_depth_bfs",
        "bm25_search",
        "focused_relevance",
        "host_pagerank_2iter",
        "dust_param_rules",
        "dust_strip",
        "reciprocal_links",
        "postings_delta_merge",
        "degree_histogram_in",
        "kmeans_codebook",
        "ngram_containment_pairs",
        "contracted_link_graph",
        "stupid_backoff_ppl",
        "triangle_stats",
        "hyperball_centrality",
        "phrase_search",
        "cocitation_pairs",
        "lpa_communities_2sweep",
        "session_stats_30min",
        "sitemap_urlsets",
        "query_snippets",
        "term_suggestions",
        "bm25_search_collapsed",
        "postings_vbyte_stats",
        "elias_fano_stats",
        "weighted_sample_per_source",
        "bm25_maxp_search",
        "leakage_safe_splits",
        "lang_mixture",
        "salsa_2sweep",
        "heaps_fit",
        "allocation_fairness",
        "ranking_agreement",
        "comb_fusion",
        "ai_optout_screen",
        "section_chunks",
        "unigram_tokenize",
        "reshard_move_stats",
        "temperature_mixture",
        "parked_screen",
        "symspell_suggestions",
        "jsonld_entities",
        "pagination_chains",
        "rbp_err_eval",
        "ai_crawler_policy",
        "compression_ratio",
        "watermark_lateness",
        "title_consistency",
        "amp_variant_pairs",
        "bowtie_classes",
        "pca_project",
        "credit_card_signals",
        "cross_source_dups",
        "char_entropy",
        "og_properties",
        "robots_policy_diff",
        "sitemap_coverage",
        "trending_event_types",
        "percolate_alerts",
        "quantize_embeddings_int8",
        "hreflang_reciprocity",
        "politeness_compliance",
        "readability_flesch",
        "collocations_pmi",
        "dhash_near_dups",
        "zipf_fit",
        "heavy_hitter_hosts",
        "cms_host_counts",
        "cdc_chunk_dedup",
        "maxscore_topk",
        "crawl_order_curve",
        "expected_freshness",
        "spam_mass_2iter",
        "rrf_fusion",
        "ucb_host_priority",
        "bm25f_search",
        "rendezvous_shards",
        "term_proximity_rerank",
        "textrank_keywords",
        "boolean_search",
        "more_like_this",
        "capture_delta",
        "fixed_capture_delta",
        "kcore_survivors",
        "dictionary_frontcoding",
        "zorder_locality",
        "term_drift_kl",
        "frontier_eta",
        "prf_search",
        "batch_bm25_topk",
        "mmr_rerank",
        "cori_shard_select",
        "pruned_postings",
        "query_clarity",
        "ql_dirichlet_topk",
        "revisit_priority",
        "tokenizer_fertility",
        "fixed_chunk_dedup",
        # round-3 late-session additions
        "html_tables",
        "minhash_incremental_probe",
        "outlink_farms",
        "declared_lang_mismatch",
        "template_shapes",
        "url_path_dates",
        "markup_density",
        "idn_host_audit",
        "code_fraction",
        "outlink_novelty",
        "sniff_content_type",
        "publish_date_fusion",
        "truncation_recall",
        "path_template_census",
        # round-4 additions
        "dhash_hot_band_census",
        "bpe_encode_fixed_merges",
        "gpt2_bpe_encode_fixed",
        "kneser_ney_ppl",
        "vocab_richness",
        "host_url_space_estimate",
        "fuzzy_decontaminate",
    ]
    out = {}
    for name in names:
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        n = df.count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main_default(args):
    from spider_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="spider-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = headline_queries(spark, sf_dir)

    # crawl throughput (north-star metric) over the synthetic pages table,
    # scaled with sf: sf0.1 → 60k CC-like pages at the politeness cap
    sf = _sf_from_dir(sf_dir)
    n_pages = max(2000, int(600_000 * sf))
    n_hosts = max(16, n_pages // 150)
    t0 = time.monotonic()
    fetched, crawl_s = run_crawl(spark, n_pages, n_hosts, ticks=3, budget=32)
    queries["crawl_3_ticks"] = round(time.monotonic() - t0, 3)

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline queries + 3-tick crawl wall time",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "crawl_urls_fetched": fetched,
                "crawl_urls_per_sec": round(fetched / crawl_s, 1) if crawl_s else None,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


def main_crawl_only(args):
    from spider_spark.session import get_spark

    spark = get_spark(app_name=f"crawl-bench-{args.cores}", cpus=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM/codegen/Arrow path on a rich-page crawl, not billed
    run_crawl(spark, 8000, 32, ticks=2, budget=16,
              body_words=args.body_words, extra_links=args.extra_links)
    prof: dict | None = {} if args.profile else None
    fetched, dt = run_crawl(
        spark, args.pages, args.hosts, ticks=args.ticks, budget=args.budget,
        tick_ms=args.tick_ms, body_words=args.body_words,
        extra_links=args.extra_links, pages_dir=args.pages_dir,
        cache_pages=not args.no_cache_pages, profile_out=prof,
    )
    rec = {"cores": args.cores, "fetched": fetched, "seconds": round(dt, 2),
           "urls_per_sec": round(fetched / dt, 1)}
    if prof is not None:
        rec["profile"] = prof
    print(json.dumps(rec))
    spark.stop()


def main_scaling(args):
    from spider_spark import synth
    from spider_spark.session import get_spark

    results = {}
    gen_tmp = tempfile.mkdtemp(prefix="scaling-pages-")
    pages_dir = f"{gen_tmp}/pages"
    # generate the corpus ONCE (full machine) — both legs read the same files
    gen_spark = get_spark(app_name="scaling-gen", cpus=32)
    gen_spark.sparkContext.setLogLevel("ERROR")
    synth.generate_pages(
        gen_spark, args.pages, n_hosts=args.hosts,
        body_words=args.body_words, extra_links=args.extra_links,
    ).repartition(64, "url").write.mode("overwrite").parquet(pages_dir)
    gen_spark.stop()
    first = True
    for cores in (args.n, 4 * args.n):
        best = None
        for _attempt in range(args.runs_per_leg):
            if not first:
                time.sleep(60)  # let the previous run's writeback/teardown settle
            first = False
            env = dict(os.environ)
            env.setdefault("SPARK_DRIVER_MEMORY", "48g")  # single-JVM local mode holds all executors
            cmd = [
                sys.executable, __file__, "--crawl-only", "--cores", str(cores),
                "--pages", str(args.pages), "--hosts", str(args.hosts),
                "--ticks", str(args.ticks), "--budget", str(args.budget),
                "--tick-ms", str(args.tick_ms), "--pages-dir", pages_dir,
                "--body-words", str(args.body_words), "--extra-links", str(args.extra_links),
            ] + (["--no-cache-pages"] if args.no_cache_pages else [])
            out = subprocess.run(cmd, capture_output=True, text=True, env=env, check=True)
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            # best-of-N: external interference only ever slows a run down
            if best is None or r["urls_per_sec"] > best["urls_per_sec"]:
                best = r
        results[cores] = best
    n, n4 = args.n, 4 * args.n
    eff = results[n4]["urls_per_sec"] / results[n]["urls_per_sec"] / 4.0
    print(json.dumps({
        "metric": "crawl throughput scaling efficiency N->4N",
        "N": n, "4N": n4,
        "tput_N": results[n]["urls_per_sec"],
        "tput_4N": results[n4]["urls_per_sec"],
        "efficiency": round(eff, 3),
        "pages": args.pages, "ticks": args.ticks,
        "detail": results,
    }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--crawl-only", action="store_true")
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--n", type=int, default=2, help="scaling mode: N cores (vs 4N)")
    p.add_argument("--pages", type=int, default=800_000)
    p.add_argument("--hosts", type=int, default=2500)
    p.add_argument("--ticks", type=int, default=3)
    p.add_argument("--budget", type=int, default=96)
    p.add_argument("--tick-ms", type=int, default=120_000)
    p.add_argument("--pages-dir", type=str, default=None)
    p.add_argument("--body-words", type=int, default=800)
    p.add_argument("--extra-links", type=int, default=80)
    p.add_argument("--no-cache-pages", action="store_true")
    p.add_argument("--runs-per-leg", type=int, default=2)
    # per-stage timing on a crawl leg (catalog-call wall seconds + per-tick
    # walls in the JSON) — the scaling evidence's stage breakdown
    p.add_argument("--profile", action="store_true")
    a = p.parse_args()
    if a.crawl_only:
        main_crawl_only(a)
    elif a.scaling:
        main_scaling(a)
    else:
        main_default(a)
