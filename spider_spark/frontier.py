"""One crawl tick as a declarative DataFrame plan.

The distributed generalization of the reference's iterative scrape loop
(src/scrapers/tree.ts:141-267: frontier ≙ unclicked elements, seen-set ≙
clickedSelectors, links accumulate keep-first) — each tick is:

    frontier → robots gate → per-host politeness top-k → fetch
             → parse (byte-identical UDFs) → explode links → canonicalize
             → keep-first dedupe → anti-join url_seen → next frontier

Scale decisions (see SURVEY.md §4):
- politeness top-k is computed in TWO phases — rank within (host, salt)
  then within host — so a hot mega-host never serializes one partition,
- the fetch is an equi-join against the pages table on the canonical URL
  (unique key ⇒ no join skew; the politeness cap bounds per-tick size),
- keep-first "encounter order" is the data-derived key (priority,
  discovered_tick, seq) where seq is the fixed-width hex link-path — stable
  under any repartitioning, which is what makes crawl-order replay exact,
- the seen filter is an exact left_anti against the cumulative url_seen
  (ground truth); a sharded bloom prefilter (bloom.py) can cut the shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import udfs

SEQ_WIDTH = 12  # hex digits per link-path component; supports 2^48 links/page

FRONTIER_SCHEMA = StructType(
    [
        StructField("url_canon", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("host", StringType(), False),
        StructField("priority", IntegerType(), False),
        StructField("discovered_tick", IntegerType(), False),
        StructField("seq", StringType(), False),
    ]
)

# The results-ledger schema (what results_projection / misses_projection /
# blocked_projection emit). The catalog reads ledger dirs with THIS schema
# explicitly — never inference — so checkpoints written by older engine
# versions (no content_fp) or with cfg.store_text=False read
# deterministically with the absent columns as nulls (ADVICE r02 #2).
RESULTS_SCHEMA = StructType(
    [
        StructField("tick", IntegerType(), True),
        StructField("url_canon", StringType(), True),
        StructField("final_url", StringType(), True),
        StructField("url_hash", LongType(), True),
        StructField("host", StringType(), True),
        StructField("priority", IntegerType(), True),
        StructField("seq", StringType(), True),
        StructField("status", IntegerType(), True),
        StructField("content_fp", LongType(), True),
        StructField("title", StringType(), True),
        StructField("description", StringType(), True),
        StructField("detected", udfs.DETECTED_STRUCT, True),
        StructField("is_pdf", BooleanType(), True),
        StructField("link_count", IntegerType(), True),
        StructField("links", ArrayType(udfs.LINK_STRUCT), True),
        StructField("lang", StringType(), True),
        StructField("partition_id", IntegerType(), True),
        StructField("text", StringType(), True),
    ]
)


@dataclass
class CrawlConfig:
    per_host_budget: int = 8  # max fetches per host per tick (politeness)
    tick_ms: int = 10_000  # nominal tick wall budget — modulates crawl_delay
    # fetch stage: 'join' = equi-join against the pages table (the sandbox
    # "network"; also the replay path against an archived corpus); 'live' =
    # the mapInPandas HTTP adapter (fetch.live_fetch) behind the registry
    # seam — same plan shape, the join swapped for the fetch UDF. The
    # Crawler's ``transport`` is injected into the live stage (None = the
    # stdlib urllib transport).
    adapter: str = "join"
    fetch_timeout_s: float = 30.0  # reference default 30 000 ms (types.ts:127)
    # live-adapter intra-partition request concurrency (fetch.fetch_rows):
    # the reference batches fetches with Promise.all (README.md:488-502);
    # here a per-partition thread pool overlaps the network waits of one
    # Arrow batch, order-preserving so output is row-identical to
    # sequential. 1 = strict sequential (the deterministic default).
    fetch_concurrency: int = 1
    max_ticks: int = 10
    # total fetch budget across the whole run. The reference parses
    # maxRequests but never enforces it (SURVEY.md §2.3); here it is real —
    # divergence-by-strictness, documented.
    max_requests: int | None = None
    # opt-in round-robin rebalance of the fetch batch before parsing, for
    # page stores that are NOT hash-distributed on url (see fetch_and_parse
    # skew note); None = no extra shuffle
    fetch_partitions: int | None = None
    # broadcast the redirect table into the per-hop joins only below this
    # row count (counted once per run); above it, shuffle hash join on src —
    # a web-scale redirect table would OOM the driver if always broadcast
    redirect_broadcast_rows: int = 1_000_000
    # sharded bloom prefilter for the seen anti-join (bloom.py): identical
    # results, less anti-join shuffle at 10^10-URL scale
    use_bloom: bool = False
    bloom_shards: int = 64
    bloom_bits_per_shard: int = 1 << 20
    # cuckoo alternative to the bloom (cuckoo.py): same exactness contract,
    # plus deletion (recrawl policies can evict URLs). Mutually exclusive
    # with use_bloom.
    use_cuckoo: bool = False
    cuckoo_shards: int = 64
    cuckoo_buckets_per_shard: int = 1 << 14
    cuckoo_slots: int = 4
    politeness_salt: int = 16  # phase-1 salt buckets for the top-k window
    # spider-trap guard (operators/traps.py) applied to candidate links
    # BEFORE the seen anti-join, so trapped URLs never enter url_seen and
    # the seen set stays exactly "enqueued ∪ fetched" (resume invariant).
    # The filter is deterministic in row data, so re-dropping the same
    # candidates every tick is map-only and replay-exact.
    trap_guard: bool = False
    trap_max_url_len: int = 2048
    trap_max_path_depth: int = 16
    trap_max_query_params: int = 8
    trap_max_segment_repeat: int = 3
    # per-(host,pattern) cap per tick; None disables the windowed cap and
    # keeps the guard purely map-side
    trap_max_per_pattern: int | None = None
    # fold seen deltas into one snapshot every M ticks (None = never):
    # keeps the anti-join reading O(M) dirs instead of O(ticks)
    compact_seen_every: int | None = 8
    # transient-failure retry (the online form of
    # operators/recrawl.retry_backoff_plan — Nutch db.fetch.retry.max /
    # Heritrix backoff discipline; the reference passes the same idea
    # through as Crawlee's maxRequestRetries): URLs whose fetch returned a
    # status in retry_statuses are re-enqueued after
    # retry_base_delay_ticks·2^(attempts−1) ticks (capped), and dropped for
    # good past retry_max consecutive failures. A non-transient capture
    # resets the counter. State is a per-tick checkpoint snapshot
    # (catalog.write_retry_state) bounded by the failure rate, so resume
    # replays the same schedule. Off by default: the reference's simple
    # adapter does not retry.
    retry_transient: bool = False
    retry_statuses: tuple = (599,)
    retry_max: int = 3
    retry_base_delay_ticks: int = 1
    retry_max_delay_ticks: int = 64
    # Mercator content-seen test (extract_new_links' fp_seen side): pages
    # whose content fingerprint was already captured contribute no
    # outlinks — mirrors and aliased duplicates stop polluting the
    # frontier. The fp set derives from the latest_capture snapshot
    # (already incrementally compacted — no new state), so "seen" means
    # "currently the latest capture of some URL". Off by default: the
    # reference processes every fetched page's links.
    content_seen_dedup: bool = False
    store_text: bool = True
    respect_robots: bool = True
    # honor in-page robots directives (metarobots.py): page-level
    # <meta name=robots ... nofollow> empties that page's outlink array at
    # the parse projection (the snapshot's links column IS the directive's
    # effect — no ledger schema change, resume replay-exact), and
    # link-level rel=nofollow/ugc/sponsored links are dropped inside the
    # link explode before keep-first. Off by default: the reference
    # captures rel (types.ts:46) but follows everything.
    honor_meta_robots: bool = False
    # adaptive per-host politeness (operators/adaptive.py): AIMD budget
    # state carried tick-to-tick in the checkpoint (host_state dirs) and
    # applied as a tightening-only override inside politeness_tag. The
    # error threshold is an integer percentage (engine-portable compares).
    adaptive_politeness: bool = False
    adaptive_error_pct: int = 20
    adaptive_min_budget: int = 1
    adaptive_increase: int = 1
    adaptive_error_min_status: int = 500
    # frontier priority aging (anti-starvation): each tick a deferred URL
    # waits, its effective priority value drops by this much (lower value =
    # crawled sooner), clamped at 0 — so a low-priority URL deferred long
    # enough eventually outranks fresh high-priority arrivals instead of
    # starving behind them. 0 = off (strict band ordering, the reference's
    # semantics). Deterministic in (tick, row data): replay/resume exact.
    priority_aging_per_tick: int = 0
    # priority bands, mirroring the reference's adapter priority ordering
    # (src/platform/registry.ts:71-76; bands src/platform/types.ts:61-66)
    priority_expr: str = (
        "CASE WHEN url_canon LIKE '%/filepro/documents/?preview=%' THEN 100 "
        "WHEN url_canon LIKE '%/docushare/dsweb/%' THEN 110 "
        "WHEN url_canon LIKE '%/download/%' THEN 150 ELSE 200 END"
    )


def seeds_to_frontier(
    spark, seed_urls: list[str], cfg: CrawlConfig, dead_letter_path: str | None = None
) -> DataFrame:
    """Seed list → tick-0 frontier with deterministic seq by list order.
    Arrow-path createDataFrame + one fused canonicalize UDF pass.

    Invalid/non-http(s) seeds don't raise (the reference throws
    ValidationError per URL, simple.ts:54-62 — exceptions don't scale
    row-wise): they are dropped, and recorded to ``dead_letter_path``
    when given."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"url": seed_urls, "seed_idx": range(len(seed_urls))})
    )
    df = df.withColumn("ch", udfs.canon_and_host("url")).select(
        "url", "seed_idx", F.col("ch.url_canon").alias("url_canon"), F.col("ch.host").alias("host")
    )
    valid = F.col("url_canon").isNotNull() & F.col("host").isNotNull()
    if dead_letter_path is not None:
        df = df.persist()
        df.filter(~valid).select(
            "url", "seed_idx", F.lit("validation_error").alias("reason")
        ).write.mode("overwrite").parquet(dead_letter_path)
    df = df.filter(valid).drop("url")
    return (
        df.withColumn("url_hash", udfs.col_url_hash(F.col("url_canon")))
        .withColumn("priority", F.expr(cfg.priority_expr).cast("int"))
        .withColumn("discovered_tick", F.lit(0))
        .withColumn("seq", F.lpad(F.conv(F.col("seed_idx").cast("string"), 10, 16), SEQ_WIDTH, "0"))
        .select([f.name for f in FRONTIER_SCHEMA.fields])
        # keep-first on duplicate seeds; identity is (hash, canon) — the hash
        # alone is 64-bit and collides ~3 times at 10^10 URLs
        .withColumn("rn", F.row_number().over(Window.partitionBy("url_hash", "url_canon").orderBy("seq")))
        .filter("rn = 1")
        .drop("rn")
    )


def politeness_tag(
    frontier: DataFrame,
    cfg: CrawlConfig,
    robots: DataFrame | None,
    budget_overrides: DataFrame | None = None,
    tick: int | None = None,
) -> DataFrame:
    """Tag every frontier row for this tick: ``is_blocked`` (robots) and
    ``is_selected`` (within the per-host politeness budget). One pass, no
    anti-joins — the caller persists the tagged frame and derives the
    selected/deferred/blocked splits as cheap filters, so the window shuffles
    run exactly once per tick regardless of how many actions follow.

    Per-host budget ≙ the reference's rate limiting (tree.ts:296-303) made
    explicit; robots gating is first-class here (reference defers it to the
    caller — SPEC.md:254-255). Two-phase ranking kills hot-host skew: the
    phase-1 window partitions on (host, salt) so no single task ever ranks a
    mega-host alone; phase 2 ranks only phase-1 survivors (≤ salt·budget
    rows per host, bounded regardless of host size).

    Robots-table contract (two explicit schemas, not a heuristic): a table
    WITH ``allow_prefixes`` (produced by ``robots.rules_from_bodies``)
    carries RFC 9309 pattern semantics — ``*``/``$`` wildcards,
    longest-match, Allow overrides, matched against path?query. A table
    WITHOUT it (``synth.ROBOTS_SCHEMA``-shaped) carries literal
    path-prefix semantics. Callers who hand-build a table with an
    ``allow_prefixes`` column are opting into RFC pattern interpretation
    of their disallow strings.

    ``budget_overrides`` — an optional (host, budget) table (the adaptive
    AIMD state, operators/adaptive.py) — can only TIGHTEN: the effective
    budget is least(robots/default budget, override), so a recovering host
    never overrides robots crawl-delay, and an unlisted host keeps the
    static budget. Broadcast: the table is ≤ #distinct-hosts rows."""
    f = frontier
    if robots is not None and cfg.respect_robots:
        f = f.join(F.broadcast(robots), "host", "left")
        path = F.parse_url(F.col("url_canon"), F.lit("PATH"))
        if "allow_prefixes" in robots.columns:
            # Full RFC 9309 evaluation (rules parsed from robots.txt bodies
            # by spider_spark.robots): longest-match with '*'/'$' wildcards,
            # Allow overrides, matched against path?query. Pure Catalyst.
            from .robots import col_robots_allowed

            query = F.parse_url(F.col("url_canon"), F.lit("QUERY"))
            path_q = F.concat(
                path, F.when(query.isNotNull(), F.concat(F.lit("?"), query)).otherwise(F.lit(""))
            )
            disallowed = ~col_robots_allowed(
                path_q, F.col("allow_prefixes"), F.col("disallow_prefixes")
            )
        else:
            # legacy pre-parsed rules table: literal prefix semantics
            disallowed = F.exists(
                F.coalesce(F.col("disallow_prefixes"), F.array()),
                lambda p: path.startswith(p),
            )
        # crawl_delay shrinks the per-host budget: at most tick_ms/delay
        # fetches fit in a politeness-compliant tick
        budget = F.when(
            F.col("crawl_delay_ms").isNotNull() & (F.col("crawl_delay_ms") > 0),
            F.greatest(
                F.lit(1),
                F.least(F.lit(cfg.per_host_budget), (F.lit(cfg.tick_ms) / F.col("crawl_delay_ms")).cast("int")),
            ),
        ).otherwise(F.lit(cfg.per_host_budget))
        f = f.select(*frontier.columns, disallowed.alias("is_blocked"), budget.alias("host_budget"))
    else:
        f = f.select(
            *frontier.columns,
            F.lit(False).alias("is_blocked"),
            F.lit(cfg.per_host_budget).alias("host_budget"),
        )

    if budget_overrides is not None:
        ov = F.broadcast(
            budget_overrides.select("host", F.col("budget").alias("_adaptive_budget"))
        )
        f = (
            f.join(ov, "host", "left")
            .withColumn(
                "host_budget",
                F.least(
                    F.col("host_budget"),
                    F.coalesce("_adaptive_budget", F.col("host_budget")),
                ),
            )
            .drop("_adaptive_budget")
        )

    if cfg.priority_aging_per_tick > 0 and tick is not None:
        # anti-starvation: age deferred URLs toward the front (see
        # CrawlConfig.priority_aging_per_tick). Clamped at 0 so ancient
        # URLs saturate rather than going negative without bound.
        eff_priority = F.greatest(
            F.lit(0),
            F.col("priority")
            - F.lit(cfg.priority_aging_per_tick) * (F.lit(tick) - F.col("discovered_tick")),
        )
    else:
        eff_priority = F.col("priority")
    order = [eff_priority, F.col("discovered_tick"), F.col("seq")]
    salt = F.pmod(F.col("url_hash"), F.lit(cfg.politeness_salt))
    # blocked rows rank last within their bucket so they never displace a
    # crawlable row from the budget
    blocked_last = F.col("is_blocked").cast("int")
    w1 = Window.partitionBy("host", salt).orderBy(blocked_last, *order)
    w2 = Window.partitionBy("host").orderBy(blocked_last, *order)
    ranked1 = f.withColumn("rk1", F.row_number().over(w1))
    phase1_ok = F.col("rk1") <= F.col("host_budget")
    # phase 2 ranks only phase-1 survivors (≤ salt·budget rows per host); a
    # host's true top-budget rows always survive phase 1 (each is within the
    # top-budget of its own salt bucket), so the split is exact
    survivors = ranked1.filter(phase1_ok).withColumn("rk", F.row_number().over(w2))
    sel_flag = (F.col("rk") <= F.col("host_budget")) & ~F.col("is_blocked")
    out_cols = [*frontier.columns, "is_blocked"]
    return survivors.select(*out_cols, sel_flag.alias("is_selected")).unionByName(
        ranked1.filter(~phase1_ok).select(*out_cols, F.lit(False).alias("is_selected"))
    )


MAX_REDIRECTS = 5  # simple.ts:100 — strict-divergence past this (see below)


def resolve_redirects(
    selected: DataFrame, redirects: DataFrame | None, broadcast: bool = True
) -> DataFrame:
    """Follow redirect chains up to MAX_REDIRECTS hops (simple.ts:89-120):
    adds ``final_url`` (the last location — links resolve against it, like
    the simple adapter's Page.url) and ``redirect_error``.

    Chains longer than the limit map to status 599. DIVERGENCE-BY-
    STRICTNESS (like max_requests): the reference's undici interceptor
    stops following after 5 hops and returns the 3xx response body
    (statusCode < 400 ⇒ no NetworkError, simple.ts:104-109); this engine
    treats an over-long chain as a dead fetch instead of emitting an empty
    3xx page — documented, deliberate.

    Each hop is one equi-join against the redirect table — BROADCAST only
    when the caller says the table is small (``broadcast=True``); a
    web-scale redirect table (often 10-30% of URLs) cannot be broadcast,
    so the caller size-gates it (Crawler counts once per run) and the
    planner falls back to a shuffle hash join on ``src``. Chains longer
    than the constant don't exist in practice, so the loop unrolls to a
    fixed 6-join plan."""
    if redirects is None:
        return selected.withColumn("final_url", F.col("url_canon")).withColumn(
            "redirect_error", F.lit(False)
        )
    r = redirects.select(F.col("src"), F.col("location"))
    if broadcast:
        r = F.broadcast(r)
    out = selected.withColumn("final_url", F.col("url_canon"))
    for _hop in range(MAX_REDIRECTS + 1):
        out = (
            out.join(r, out.final_url == r.src, "left")
            .withColumn("final_url", F.coalesce(F.col("location"), F.col("final_url")))
            .withColumn(f"_hop{_hop}", F.col("location").isNotNull())
            .drop("src", "location")
        )
    # a 6th successful hop means the chain exceeded the limit
    return out.withColumn("redirect_error", F.col(f"_hop{MAX_REDIRECTS}")).drop(
        *[f"_hop{i}" for i in range(MAX_REDIRECTS + 1)]
    )


def fetch_and_parse(
    selected: DataFrame,
    pages: DataFrame,
    cfg: CrawlConfig,
    redirects: DataFrame | None = None,
    redirects_broadcast: bool = True,
) -> DataFrame:
    """The sandbox "network": resolve redirects (≤5 hops), then equi-join
    the selected frontier against the pages table on the FINAL URL,
    preserving the fetch-adapter contract (url → content, status,
    final_url) of src/adapters/simple.ts:34-154 — links are extracted
    against the final URL, exactly like the simple adapter's Page.url
    (simple.ts:115-121). On a live cluster this stage is the same plan
    with the join replaced by a fetch pandas-UDF over mapInPandas.

    Join strategy: the politeness budget bounds |selected|, so the frontier
    side is BROADCAST and the pages table is only ever SCANNED, exactly
    once — a plain left join would shuffle+sort the full pages table every
    tick (the scan is the 100 TB side). Returns hits ∪ redirect-error rows
    (status 599 ≙ NetworkError); the caller derives 404 misses from the
    written snapshot (misses_projection), so no second corpus scan or
    broadcast subquery is needed."""
    resolved = resolve_redirects(selected, redirects, broadcast=redirects_broadcast)
    ok = resolved.filter(~F.col("redirect_error")).drop("redirect_error")
    pages_side = pages.select(
        F.col("url").alias("final_url"),
        F.col("html"),
        F.col("lang").alias("page_lang"),
        F.col("warc_ts"),
    )
    hits = pages_side.join(F.broadcast(ok), "final_url", "inner")
    # SKEW NOTE: the page store must be hash-distributed on url (the
    # engine's storage contract — synth/bench write it that way). On a
    # host-contiguous layout, politeness (≤budget rows/host) makes
    # small-host scan splits ~100% hits while big-host splits are <1%, and
    # one task ends up carrying most of the parse (measured: stage wall ≈
    # slowest task). For corpora you don't control, set
    # cfg.fetch_partitions to force a round-robin rebalance of the fetch
    # batch (moves only the politeness-bounded batch, never the corpus).
    if cfg.fetch_partitions:
        hits = hits.repartition(cfg.fetch_partitions)
    hits = hits.withColumn("status", F.lit(200)).withColumn(
        "parsed", udfs.parse_page(F.col("final_url"), F.col("html"))
    )
    out_cols = [*selected.columns, "final_url", "html", "page_lang", "warc_ts", "status", "parsed"]
    if redirects is None:
        return hits.select(*out_cols)
    err = (
        resolved.filter(F.col("redirect_error"))
        .withColumn("html", F.lit(None).cast("binary"))
        .withColumn("page_lang", F.lit(None).cast("string"))
        .withColumn("warc_ts", F.lit(None).cast("timestamp"))
        .withColumn("status", F.lit(599))  # NetworkError ≙ simple.ts:104-109
        .withColumn("parsed", F.lit(None).cast(udfs.PARSED_STRUCT))
    )
    return hits.select(*out_cols).unionByName(err.select(*out_cols))


def live_fetch_and_parse(
    selected: DataFrame, cfg: CrawlConfig, transport=None
) -> DataFrame:
    """The live-network form of the fetch stage: same output contract as
    ``fetch_and_parse`` (url → final_url, html, status, parsed; 599 ≙
    NetworkError), with the pages-table equi-join replaced by the
    ``fetch.live_fetch`` mapInPandas adapter (simple.ts:94-120 semantics:
    ≤5 redirects, final URL, default headers, timeout, status rows).

    Unlike the join path, the live fetcher is TOTAL — every selected row
    comes back with a status (200 hit, 404/4xx/5xx miss, 599 network
    error), so the caller skips the separate misses derivation.
    ``page_lang``/``warc_ts`` are null: a live fetch has no archive
    metadata (language is computed downstream by textqc.lang_id)."""
    from . import fetch as fetch_mod

    fetched = fetch_mod.live_fetch(
        selected,
        transport,
        url_col="url_canon",
        timeout=cfg.fetch_timeout_s,
        concurrency=cfg.fetch_concurrency,
    )
    parsed = F.when(
        F.col("status") == 200, udfs.parse_page(F.col("final_url"), F.col("html"))
    ).otherwise(F.lit(None).cast(udfs.PARSED_STRUCT))
    return fetched.select(
        *selected.columns,
        "final_url",
        "html",
        F.lit(None).cast("string").alias("page_lang"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        "status",
        parsed.alias("parsed"),
    )


def misses_projection(selected: DataFrame, fetched_keys: DataFrame, cfg: CrawlConfig, tick: int) -> DataFrame:
    """404 ledger rows: selected frontier entries with no page — an
    anti-join of two politeness-bounded sets (no corpus access)."""
    missed = selected.join(fetched_keys.select("url_canon"), "url_canon", "left_anti")
    cols = [
        F.lit(tick).alias("tick"),
        "url_canon",
        F.col("url_canon").alias("final_url"),
        "url_hash",
        "host",
        "priority",
        "seq",
        F.lit(404).alias("status"),
        F.lit(None).cast("long").alias("content_fp"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("description"),
        F.lit(None).cast(udfs.DETECTED_STRUCT).alias("detected"),
        F.lit(None).cast("boolean").alias("is_pdf"),
        F.lit(0).alias("link_count"),
        F.lit(None).cast(ArrayType(udfs.LINK_STRUCT)).alias("links"),
        F.lit(None).cast("string").alias("lang"),
        F.spark_partition_id().alias("partition_id"),
    ]
    if cfg.store_text:
        cols.append(F.lit(None).cast("string").alias("text"))
    return missed.select(*cols)


def extract_new_links(
    results: DataFrame,
    seen: DataFrame,
    cfg: CrawlConfig,
    tick: int,
    bloom: DataFrame | None = None,
    cuckoo: DataFrame | None = None,
    fp_seen: DataFrame | None = None,
) -> DataFrame:
    """Explode links, keep-first dedupe, drop already-seen.

    ``results`` is the written tick snapshot (columns ``status``, ``seq``,
    ``links``) — reading it back prunes to just those columns, so the heavy
    text/html bytes written by the parse stage are never re-read.

    Keep-first = min over the data-derived encounter key (parent seq ‖ pos),
    the distributed form of links.ts:31-35's first-writer-wins Set.

    ``fp_seen`` (one ``content_fp`` column) enables the Mercator
    content-seen test (Heydon & Najork, "Mercator: A scalable, extensible
    Web crawler", WWW 1999 §4.2.1): outlinks are processed once per unique
    CONTENT — a page whose fingerprint was already captured (under any
    URL, any earlier tick: the fp_seen side) contributes no links, and
    when several URLs in the SAME tick carry identical content only the
    first encounter (min seq) does. Null fingerprints (bodyless rows)
    pass through untouched. The fp-side shuffle carries 8 B/row."""
    src = results.filter(F.col("status") == 200)
    if fp_seen is not None:
        with_fp = src.filter(F.col("content_fp").isNotNull()).join(
            fp_seen.select("content_fp").distinct(), "content_fp", "left_anti"
        )
        first = with_fp.groupBy("content_fp").agg(F.min("seq").alias("seq"))
        with_fp = with_fp.join(first, ["content_fp", "seq"], "left_semi")
        src = src.filter(F.col("content_fp").isNull()).unionByName(with_fp)
    links = (
        src
        .select(
            F.col("seq").alias("parent_seq"),
            F.posexplode_outer(F.col("links")).alias("pos", "link"),
        )
        .filter(F.col("link.href_canon").isNotNull())
    )
    if cfg.honor_meta_robots:
        from .metarobots import col_rel_nofollow

        links = links.filter(~col_rel_nofollow(F.col("link.rel")))
    links = links.select(
        "parent_seq",
        "pos",
        F.col("link.href_canon").alias("url_canon"),
    )
    cand = links.withColumn(
        "seq",
        F.concat(
            F.col("parent_seq"),
            F.lpad(F.conv(F.col("pos").cast("string"), 10, 16), SEQ_WIDTH, "0"),
        ),
    )
    # keep-first per canonical URL: min encounter key, all in one partial-agg
    firsts = cand.groupBy("url_canon").agg(F.min("seq").alias("seq"))
    firsts = (
        firsts.withColumn("url_hash", udfs.col_url_hash(F.col("url_canon")))
        # href_canon is already WHATWG-normalized (lowercase host, no
        # userinfo), so the JVM-side parse_url extracts the same host the
        # Python resolver would — keeps this stage in codegen
        .withColumn("host", F.parse_url(F.col("url_canon"), F.lit("HOST")))
        .filter(F.col("host").isNotNull())
        .withColumn("discovered_tick", F.lit(tick + 1))
    )
    if cfg.trap_guard:
        from .operators.traps import trap_filter

        firsts = trap_filter(
            firsts,
            url_col="url_canon",
            seq_col="seq",
            max_url_len=cfg.trap_max_url_len,
            max_path_depth=cfg.trap_max_path_depth,
            max_query_params=cfg.trap_max_query_params,
            max_segment_repeat=cfg.trap_max_segment_repeat,
            max_per_pattern=cfg.trap_max_per_pattern,
        )
    if bloom is not None:
        from .bloom import filter_unseen_with_bloom

        return filter_unseen_with_bloom(
            firsts,
            seen,
            bloom,
            num_shards=cfg.bloom_shards,
            bits_per_shard=cfg.bloom_bits_per_shard,
            # tick-scoped: the crawler releases probe caches/broadcasts
            # after its actions (shardprobe.release_probe_broadcasts)
            track=True,
        )
    if cuckoo is not None:
        from .cuckoo import filter_unseen_with_cuckoo

        return filter_unseen_with_cuckoo(
            firsts, seen, cuckoo, num_shards=cfg.cuckoo_shards, track=True
        )
    # anti-join on (url_hash, fp128): the hash gives shuffle locality, the
    # 128-bit fingerprint gives equality — a 64-bit hash alone silently
    # drops ~3 never-crawled URLs per 10^10 (birthday collisions), while
    # joining on the raw string ships ~70 B/row of seen-side shuffle
    # (measured: -22% crawl throughput at local[8]); the fingerprint is
    # computed in projection before the exchange, so the shuffle carries
    # 24 B/row and collisions stay structurally impossible (192 bits)
    seen_keys = seen.select("url_hash", udfs.col_url_fp128(F.col("url_canon")).alias("url_fp"))
    return (
        firsts.withColumn("url_fp", udfs.col_url_fp128(F.col("url_canon")))
        .join(seen_keys, ["url_hash", "url_fp"], "left_anti")
        .drop("url_fp")
    )


def finalize_frontier(new: DataFrame, deferred: DataFrame, cfg: CrawlConfig) -> DataFrame:
    new = new.withColumn("priority", F.expr(cfg.priority_expr).cast("int")).select(
        [f.name for f in FRONTIER_SCHEMA.fields]
    )
    return deferred.select([f.name for f in FRONTIER_SCHEMA.fields]).unionByName(new)


def blocked_projection(blocked: DataFrame, cfg: CrawlConfig, tick: int) -> DataFrame:
    """Robots-blocked rows recorded in results with status 451 (crawl
    ledger completeness; the reference has no robots handling to mirror)."""
    cols = [
        F.lit(tick).alias("tick"),
        "url_canon",
        F.lit(None).cast("string").alias("final_url"),
        "url_hash",
        "host",
        "priority",
        "seq",
        F.lit(451).alias("status"),
        F.lit(None).cast("long").alias("content_fp"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("description"),
        F.lit(None).cast(udfs.DETECTED_STRUCT).alias("detected"),
        F.lit(None).cast("boolean").alias("is_pdf"),
        F.lit(0).alias("link_count"),
        F.lit(None).cast(ArrayType(udfs.LINK_STRUCT)).alias("links"),
        F.lit(None).cast("string").alias("lang"),
        F.spark_partition_id().alias("partition_id"),
    ]
    if cfg.store_text:
        cols.append(F.lit(None).cast("string").alias("text"))
    return blocked.select(*cols)


def results_projection(parsed: DataFrame, cfg: CrawlConfig, tick: int) -> DataFrame:
    """Tick ledger row per fetch, including the extracted link structs —
    the results snapshot doubles as the link-graph edge source, and the
    next-frontier stage re-reads ONLY the (status, seq, links) columns."""
    links_col = F.col("parsed.links")
    if cfg.honor_meta_robots:
        from .metarobots import col_meta_robots

        # page-level nofollow: the written snapshot's links column carries
        # the directive's effect (empty array), so replay/resume re-derive
        # the identical frontier without re-reading html
        links_col = F.when(
            col_meta_robots(F.col("html")).getField("nofollow")
            & F.col("parsed.links").isNotNull(),
            F.array().cast(ArrayType(udfs.LINK_STRUCT)),
        ).otherwise(F.col("parsed.links"))
    cols = [
        F.lit(tick).alias("tick"),
        "url_canon",
        "final_url",
        "url_hash",
        "host",
        "priority",
        "seq",
        "status",
        # raw-content fingerprint: change detection for conditional
        # revalidation (Crawler.revalidate_urls) and the capture log for
        # operators/recrawl.change_rate — computed before extraction, so
        # unchanged pages can skip the parse UDF entirely on recrawl
        F.when(F.col("html").isNotNull(), F.xxhash64("html")).alias("content_fp"),
        F.col("parsed.title").alias("title"),
        F.col("parsed.description").alias("description"),
        F.col("parsed.detected").alias("detected"),
        F.col("parsed.is_pdf").alias("is_pdf"),
        F.size(F.coalesce(links_col, F.array())).alias("link_count"),
        links_col.alias("links"),
        F.col("page_lang").alias("lang"),
        F.spark_partition_id().alias("partition_id"),  # per-partition lineage
    ]
    if cfg.store_text:
        cols.append(F.col("parsed.text").alias("text"))
    return parsed.select(*cols)
