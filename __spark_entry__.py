"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the flagship smoke query (sf0.001).  ``queries()`` maps
one entry per implemented operator family from SURVEY.md §2 to a callable
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` holds the DuckDB-
equivalent SQL for every SQL-expressible entry (same column names/aliases on
both sides).  Non-SQL-expressible operators (crawl tick, MinHash/SimHash LSH,
hyperplane ANN, multimodal UDF plumbing) are registered rows-only.

Numeric-parity discipline: monetary/metric sums go through DECIMAL (exact,
order-independent) and are cast to DOUBLE at the end; ratios/cosines are
rounded; everything else is int/string/bool — so Spark and DuckDB hash equal.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spider_spark import cache as cache_ops
from spider_spark import scrape, synth, udfs
from spider_spark.crawler import Crawler
from spider_spark.frontier import CrawlConfig
from spider_spark.operators import dedup, multimodal, similarity, textqc
from spider_spark.platform import default_registry

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_STOP_EN = textqc.STOPWORDS["en"]


def _sql_list(words) -> str:
    return "[" + ", ".join("'" + w + "'" for w in words) + "]"


# DuckDB mirror of textqc.repetition_signals — shared by the
# repetition_signals oracle and (as a subquery) the clean_corpus oracle.
_REPETITION_SQL = """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents),
    g AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(generate_series(1, len(toks) - 1),
                                      i -> toks[i] || ' ' || toks[i + 1])
                  ELSE [] END AS grams
      FROM t),
    gc AS (
      SELECT doc_id, gram, count(*) AS c
      FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
      GROUP BY doc_id, gram),
    gm AS (SELECT doc_id, max(c) AS topc, sum(c) AS total FROM gc GROUP BY doc_id)
    SELECT g.doc_id,
           len(toks) AS n_words,
           ROUND(CASE WHEN len(toks) > 0
                      THEN CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks)
                      ELSE 0 END, 4) AS dup_word_frac,
           ROUND(CASE WHEN len(grams) > 0
                      THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams)
                      ELSE 0 END, 4) AS dup_ngram_frac,
           ROUND(CASE WHEN coalesce(gm.total, 0) > 0
                      THEN CAST(gm.topc AS DOUBLE) / gm.total
                      ELSE 0 END, 4) AS top_ngram_frac
    FROM g LEFT JOIN gm ON g.doc_id = gm.doc_id
"""


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: corpus-QC pipeline over sf0.001 documents — token counts,
    language-ID, quality score, exact-dup fingerprint, rolled up per
    (predicted language, quality band). One scan, one shuffle."""
    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    rep = textqc.quality_report(docs, text_col="text")
    return (
        rep.groupBy("lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.countDistinct("fingerprint").alias("n_unique"),
        )
        .orderBy("lang_pred")
    )


# ---------------------------------------------------------------------------
# oracle-backed queries (each mirrors a SURVEY.md §2 operator's semantics)
# ---------------------------------------------------------------------------


def q_politeness_topk(spark, sf_dir):
    """Per-host politeness budget top-k (§2.8 frontier⋈host_budgets;
    tree.ts:296-303): top-3 orders per customer by (date, key)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk")
    )


def q_seen_anti_join(spark, sf_dir):
    """url_seen left-anti dedupe (§2.5): customers with no orders."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders.select("o_custkey"), customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def q_keep_first_dedupe(spark, sf_dir):
    """Keep-first-by-encounter-order dedupe (links.ts:31-35 generalized):
    first event per (user, type) by (ts, event_id)."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
    )


_LINK_FILTER_CFG = {"urlContains": ["src1"], "textContains": ["window"], "excludes": ["slow"]}


def q_link_filter(spark, sf_dir):
    """filterLinks (link-filter.ts:24-66) as a pure Catalyst predicate:
    include-union on href/text lower-contains, then excludes.
    href ≙ documents.source, text ≙ documents.text."""
    docs = _t(spark, sf_dir, "documents")
    pred = udfs.col_filter_links_predicate(F.col("source"), F.col("text"), _LINK_FILTER_CFG)
    return docs.filter(pred).select("doc_id", "source", "lang")


def q_detector_first_match(spark, sf_dir):
    """First-match-wins detector chain (detectors.ts:142-193): ordered
    regexp_extract chain, coalesced in priority order."""
    docs = _t(spark, sf_dir, "documents")
    d1 = F.nullif(F.regexp_extract("text", "agg ([a-z]+)", 1), F.lit(""))
    d2 = F.nullif(F.regexp_extract("text", "window ([a-z]+)", 1), F.lit(""))
    d3 = F.nullif(F.regexp_extract("text", "join ([a-z]+)", 1), F.lit(""))
    strategy = (
        F.when(d1.isNotNull(), "wordpress-pdf-link")
        .when(d2.isNotNull(), "civicweb-pdf-link")
        .when(d3.isNotNull(), "docushare-doc-link")
    )
    matched = F.coalesce(d1, d2, d3)
    return (
        docs.select("doc_id", matched.alias("matched"), strategy.alias("strategy"))
        .filter(F.col("matched").isNotNull())
    )


_EXT_CASE = [
    (0, ".pdf"), (1, ".doc"), (2, ".docx"), (3, ".txt"), (4, ".md"),
    (5, ".rtf"), (6, ".html"), (7, ".zip"), (8, ".png"),
]


def q_doc_extension_filter(spark, sf_dir):
    """findDocumentLinks suffix filter (scrapeDocument.ts:333-360) +
    inferContentType (download-utils.ts:59-66) over synthesized filenames."""
    part = _t(spark, sf_dir, "part")
    ext = F.when(F.lit(False), "")
    for m, e in _EXT_CASE:
        ext = ext.when(F.pmod("p_partkey", F.lit(9)) == m, e)
    fname = F.concat(F.lit("file_"), F.col("p_partkey").cast("string"), ext)
    df = part.select("p_partkey", fname.alias("filename"))
    kept = df.filter(udfs.col_doc_extension_predicate(F.col("filename")))
    return kept.select(
        "p_partkey", "filename", udfs.infer_content_type(F.col("filename")).alias("content_type")
    )


def q_exact_dedupe_stats(spark, sf_dir):
    """Exact dedup (hash-groupBy, §2.5): corpus-level identity stats in one
    map-side-combinable aggregation."""
    docs = _t(spark, sf_dir, "documents")
    h = F.sha2(F.col("text"), 256)
    return docs.select(h.alias("content_hash")).agg(
        F.count("*").alias("n_total"),
        F.countDistinct("content_hash").alias("n_unique"),
        (F.count("*") - F.countDistinct("content_hash")).alias("n_dup_rows"),
    )


def q_cache_key(spark, sf_dir):
    """createCacheKey (cache.ts:48-105): namespace + sha256 over the stable
    stringify of {parts:[], url} — the url_seen identity discipline."""
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://docs.test/"), F.col("doc_id").cast("string"))
    payload = F.concat(F.lit('{"parts":[],"url":"'), url, F.lit('"}'))
    return docs.select(
        "doc_id", F.concat(F.lit("doc:"), F.sha2(payload, 256)).alias("cache_key")
    )


def q_host_shard(spark, sf_dir):
    """Deterministic host/url sharding (the seen-filter + politeness
    partitioner, §2.5): md5-nibble shard histogram."""
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://docs.test/"), F.col("doc_id").cast("string"))
    return (
        docs.select(F.substring(F.md5(url), 1, 1).alias("shard"))
        .groupBy("shard")
        .agg(F.count("*").alias("n"))
    )


def q_robots_parse(spark, sf_dir):
    """robots.txt ingestion (RFC 9309; first-class per the north rule —
    reference defers robots to the caller, SPEC.md:254-255): synthesize a
    raw robots.txt body per doc_id (comments, mixed-case directives, a
    greedybot group that must NOT apply, and for doc_id%3==0 a
    more-specific spiderbot group), parse for UA 'spiderbot' with the
    vectorized parser, and emit the governing rules. The oracle derives
    the expected rules arithmetically — group selection, merging, comment
    stripping, and Crawl-delay math are all differential here."""
    from spider_spark.robots import robots_rules_udf

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    star_group = F.concat(
        F.lit("# synth robots\nUser-agent: greedybot\nDisallow: /\n\nUSER-AGENT: *\ndisallow: /private/"),
        F.pmod(d, F.lit(7)).cast("string"),
        F.lit("/   # trailing comment\nCrawl-delay: "),
        (F.pmod(d, F.lit(4)) + 1).cast("string"),
        F.lit("\n"),
    )
    spider_group = F.when(
        F.pmod(d, F.lit(3)) == 0,
        F.concat(
            F.lit("\nUser-agent: spiderbot\nDisallow: /only/"),
            F.pmod(d, F.lit(5)).cast("string"),
            F.lit("/\nAllow: /only/"),
            F.pmod(d, F.lit(5)).cast("string"),
            F.lit("/pub/\nCrawl-delay: 2\n"),
        ),
    ).otherwise(F.lit(""))
    bodies = docs.select(d.alias("doc_id"), F.concat(star_group, spider_group).alias("robots_txt"))
    parsed = bodies.select(
        "doc_id", robots_rules_udf("spiderbot")(F.col("robots_txt")).alias("r")
    )
    return parsed.select(
        "doc_id",
        F.col("r.matched_ua").alias("matched_ua"),
        F.size("r.disallow_prefixes").alias("n_disallow"),
        F.element_at("r.disallow_prefixes", 1).alias("first_disallow"),
        F.size("r.allow_prefixes").alias("n_allow"),
        F.col("r.crawl_delay_ms").alias("crawl_delay_ms"),
    )


def q_metrics_rollup(spark, sf_dir):
    """ScrapeMetrics-style aggregation (§2.7) at TPC-H Q1 shape: exact
    DECIMAL partial-agg sums (order-independent), cast to DOUBLE at the end."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(25,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
            F.sum(dec("l_discount")).cast("double").alias("sum_disc"),
            F.count("*").alias("n"),
        )
    )


def q_orders_per_nation(spark, sf_dir):
    """Broadcast-join rollup (§2.8 frontier⋈robots analog): orders per
    nation through customer, nation side broadcast."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,2)")).cast("double").alias("total_price"),
        )
    )


def q_events_hourly(spark, sf_dir):
    """Per-tick metrics rollup analog (§2.7): tumbling 1h event windows.
    Pins the session to UTC so hour truncation matches DuckDB's naive
    timestamps regardless of the harness's timezone."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events")
    hour = F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch")
    return (
        ev.groupBy(hour, "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


def q_token_counts(spark, sf_dir):
    """Token counting (whitespace + BPE-ish regex pre-tokenizer), pure
    Catalyst — no Python in the hot path."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        textqc.col_token_count("text").alias("n_tokens"),
        textqc.col_bpe_ish_token_count("text").alias("n_bpe"),
    )


def q_quality_flags(spark, sf_dir):
    """Quality scoring signals (C4/Gopher-style): length band, stopword
    presence, punctuation count — deterministic and SQL-expressible."""
    docs = _t(spark, sf_dir, "documents")
    n_tokens = textqc.col_token_count("text")
    toks = F.transform(textqc.col_tokens("text"), lambda t: F.lower(t))
    sw_hits = F.size(F.filter(toks, lambda t: t.isin(_STOP_EN)))
    punct = F.length(F.regexp_replace(F.col("text"), "[^.,;:!?]", ""))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        ((n_tokens >= 20) & (n_tokens <= 100000)).alias("length_ok"),
        (sw_hits > 0).alias("has_stopwords"),
        punct.alias("punct_count"),
    )


def q_lang_id(spark, sf_dir):
    """Language-ID by stopword-hit argmax (ties → greatest lang code)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", textqc.col_lang_id("text").alias("lang_pred"))


def q_declared_lang_mismatch(spark, sf_dir):
    """Declared-vs-detected language audit (langid.declared_lang_mismatch):
    lang attribute planted in all three quoting styles + a BCP 47 region
    variant, absent on every 7th doc; declared tag cycles by doc_id % 5 so
    roughly 4/5 of docs mismatch their (mostly English) text. The oracle
    derives declared from the construction and recomputes the stopword
    argmax."""
    from spider_spark.operators import langid as lid

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    tag = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"), F.lit("zh")),
        (d % 5 + 1).cast("int"),
    )
    attr = (
        F.when(d % 7 == 0, F.lit(""))
        .when(d % 3 == 0, F.concat(F.lit(' lang="'), tag, F.lit('-US"')))
        .when(d % 3 == 1, F.concat(F.lit(" lang='"), tag, F.lit("'")))
        .otherwise(F.concat(F.lit(" lang="), tag))
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html"), attr, F.lit("><body>x</body></html>")
        ).alias("html"),
        "text",
    )
    return lid.declared_lang_mismatch(pages, id_col="doc_id")


def q_similarity_topk(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline (probes broadcast, corpus scan
    stays in codegen): top-5 neighbors of vec_id 0-3."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    out = similarity.brute_force_topk(
        emb.filter(F.col("vec_id") >= 4), probes, k=5
    )
    return out.select(
        "probe_id", "vec_id", F.round("cosine", 4).alias("cosine_r"), "rank"
    )


def q_scrape_document(spark, sf_dir):
    """The scrape_document 4-branch pipeline (scrapeDocument.ts:249-320)
    over deterministic HTML wrapped around documents.text — runs the REAL
    parse UDF end-to-end; the oracle reproduces the text branch's
    byte-identical strip/collapse in SQL."""
    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    ).cast("binary")
    url = F.concat(F.lit("https://docs.test/page/"), F.col("doc_id").cast("string"))
    pages = docs.select(F.col("doc_id"), url.alias("url"), html.alias("html"))
    out = scrape.scrape_document(pages)
    return (
        out.join(pages.select("doc_id", F.col("url").alias("u")), out.url == F.col("u"))
        .select("doc_id", "title", "text", "strategy", "complete")
    )


def q_scrape_document_downloads(spark, sf_dir):
    """scrapeDocument branch 1 — downloads as first-class data
    (scrapeDocument.ts:259-281 + download-utils.ts:80-113): DownloadInfo
    structs materialized through the real branch projection; url falls back
    to download.url, type to inferContentType, complete only when bytes
    arrived error-free. Runs the REAL scrape_document plan; the oracle
    reconstructs each branch directly."""
    docs = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.pmod("doc_id", F.lit(3))
    filename = F.concat(F.lit("f"), sid, F.when(m == 2, ".xlsx").otherwise(".pdf"))
    content = F.when(m != 1, F.concat(F.lit("bytes-"), sid).cast("binary"))
    err = F.lit(None).cast("string")  # path-unavailable error comes from materialize
    dl = udfs.materialize_download(
        F.concat(F.lit("https://cdn.test/"), filename), filename, content, err
    )
    pages = docs.select(
        "doc_id",
        F.concat(F.lit("https://site.test/download/d"), sid, F.lit("/")).alias("url"),
        F.lit(b"<html></html>").alias("html"),
        F.array(dl).alias("downloads"),
    )
    out = scrape.scrape_document(pages, downloads_col="downloads")
    return (
        out.join(pages.select("doc_id", F.col("url").alias("u")), out.url == F.col("u"))
        .select(
            "doc_id", "doc_url", "type", "title", "is_pdf", "is_download",
            "complete", "strategy",
            F.sha2(F.coalesce(F.col("file_content"), F.lit(b"")), 256).alias("content_sha"),
        )
    )


def q_platform_detect(spark, sf_dir):
    """Two-phase platform registry detection (registry.ts:87-149) over
    synthesized URLs/html — URL phase, HTML phase, and low-confidence
    fallback all exercised."""
    docs = _t(spark, sf_dir, "documents")
    m = F.pmod("doc_id", F.lit(5))
    url = (
        F.when(m == 0, F.concat(F.lit("https://a.test/download/doc"), F.col("doc_id").cast("string")))
        .when(m == 1, F.concat(F.lit("https://b.civicweb.net/filepro/documents/?preview="), F.col("doc_id").cast("string")))
        .when(m == 2, F.concat(F.lit("https://c.test/docushare/dsweb/Get/Document-"), F.col("doc_id").cast("string")))
        .otherwise(F.concat(F.lit("https://d.test/page/"), F.col("doc_id").cast("string")))
    )
    html = F.when(m == 3, F.lit('<div class="wpdm-download-link">x</div>')).otherwise(F.lit("<p>plain</p>")).cast("binary")
    src = docs.select("doc_id", url.alias("url"), html.alias("html"))
    out = default_registry().detect(src)
    return out.select("doc_id", "detected_type", "detected_confidence")


def q_platform_fetch_items(spark, sf_dir):
    """fetchItems UDTF (registry.ts:174-187): resolve each source by the
    two-phase registry, then flat-map one source row into N item rows via
    the resolved adapter's extraction (real parse → WHATWG resolve →
    pattern filter, incl. %20 escaping); the oracle constructs the expected
    item rows directly."""
    docs = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.pmod("doc_id", F.lit(3))
    url = (
        F.when(m == 0, F.concat(F.lit("https://a.test/download/d"), sid))
        .when(m == 1, F.concat(F.lit("https://b.civicweb.net/filepro/documents/?preview="), sid))
        .otherwise(F.concat(F.lit("https://c.test/docushare/dsweb/Get/Document-"), sid))
    )
    html = (
        F.when(m == 0, F.concat(
            F.lit('<a href="/dl/f'), sid, F.lit('.pdf?wpdmdl='), sid,
            F.lit('">Get</a><a href="/skip.zip">z</a>'),
        ))
        .when(m == 1, F.concat(
            F.lit('<a href="/filepro/document/'), sid, F.lit("/Agenda "), sid,
            F.lit('.pdf">Agenda</a><a href="/elsewhere/no.pdf">n</a>'),
        ))
        .otherwise(F.concat(
            F.lit('<a href="/dsweb/Get/Document-'), sid, F.lit("/Min "), sid,
            F.lit('.xlsx">M</a><a href="/dsweb/x.txt">n</a>'),
        ))
    ).cast("binary")
    src = docs.select(url.alias("url"), html.alias("html"))
    out = default_registry().fetch_items(src)
    return out.select("url", "detected_type", "item_pos", "item_url", "item_text")


def q_tree_scrape_metrics(spark, sf_dir):
    """Tree-scraper ScrapeResult surface (tree.ts:55-70, 326-348): the
    9-selector precedence census over synthesized expandable HTML, with the
    reference's confidence rule (0.9 with interactions, 0.5 without); runs
    the REAL scrape_result plan (parse UDF + expand UDF), oracle
    reconstructs per doc_id."""
    from spider_spark.scrapers import scrape_result

    docs = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.pmod("doc_id", F.lit(4))
    html = (
        F.when(m == 0, F.lit('<div class="accordion-button">A</div><div class="accordion-button">B</div><a href="/x">x</a>'))
        .when(m == 1, F.lit("<details><summary>More</summary><a href='/y'>y</a></details>"))
        .when(m == 2, F.lit('<button aria-expanded="false">T</button>'))
        .otherwise(F.lit("<p>plain</p>"))
    ).cast("binary")
    pages = docs.select("doc_id", F.concat(F.lit("https://t.test/p/"), sid).alias("url"), html.alias("html"))
    out = scrape_result(pages, scraper_type="tree")
    return (
        out.join(pages.select("doc_id", F.col("url").alias("u")), out.url == F.col("u"))
        .select(
            "doc_id",
            F.col("metrics.interaction_count").alias("interaction_count"),
            F.round(F.col("strategy.confidence"), 2).alias("confidence"),
            "matched_selector",
            F.col("metrics.link_count").alias("link_count"),
        )
    )


def q_cache_read_through(spark, sf_dir):
    """Read-through fetch-cache split (cache.ts read-through ≙
    simple.ts:79-85): report the MISS set given a cache holding every third
    URL; runs the real cache-key join path."""
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://docs.test/"), F.col("doc_id").cast("string"))
    frontier = docs.select(F.col("doc_id"), url.alias("url_canon"))
    cached = frontier.filter(F.pmod("doc_id", F.lit(3)) == 0).select(
        cache_ops.col_cache_key("url_canon").alias("cache_key"),
        F.current_timestamp().alias("cached_at"),
    )
    hits, misses = cache_ops.read_through(frontier, cached)
    return misses.select("doc_id", "url_canon")


def q_find_document_links(spark, sf_dir):
    """findDocumentLinks end-to-end (scrapeDocument.ts:333-360): HTML parse
    → WHATWG href resolution → extension filter → keep-first unique. The
    oracle constructs the expected resolved URLs directly, so this checks
    the REAL extraction pipeline byte-for-byte in the correctness gate."""
    docs = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<html><body><a href="/files/a'), sid, F.lit('.pdf">pdf</a>'),
        F.lit('<a href="rel'), sid, F.lit('.txt">txt</a>'),
        F.lit('<a href="/files/a'), sid, F.lit('.pdf">dup</a>'),
        F.lit('<a href="/img'), sid, F.lit('.png">img</a></body></html>'),
    ).cast("binary")
    url = F.concat(F.lit("https://docs.test/d/"), sid)
    pages = docs.select(url.alias("url"), html.alias("html"))
    return scrape.find_document_links(pages)


# ---------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible; driver records rows+schema)
# ---------------------------------------------------------------------------


def q_crawl_tick(spark, sf_dir):
    """One full crawl epoch over the deterministic synthetic pages table:
    seeds → politeness top-k → fetch-join → byte-identical parse → link
    explode → keep-first → seen anti-join → checkpointed results.

    The checkpoint lives in a fresh (non-self-deleting) temp dir so the
    returned DataFrame reads straight from the snapshot — no driver-side
    collect (the pattern doesn't belong anywhere near the entry contract)."""
    pages = synth.generate_pages(spark, 400, n_hosts=10)
    robots = synth.generate_robots(spark, 10)
    import atexit
    import shutil

    ckpt = tempfile.mkdtemp(prefix="spider-spark-entry-crawl-")
    atexit.register(shutil.rmtree, ckpt, True)  # reclaim after the run exits
    crawler = Crawler(spark, pages, ckpt, CrawlConfig(per_host_budget=6), robots=robots)
    crawler.run(synth.seed_urls(400, 10), max_ticks=3)
    return crawler.results().select(
        "tick", "url_canon", "host", "priority", "status", "title", "link_count", "seq"
    ).orderBy("tick", "priority", "seq")


def q_minhash_near_dups(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_near_duplicates(docs, jaccard_threshold=0.5).orderBy("id_a", "id_b")


def q_simhash_near_dups(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_duplicates(docs, max_hamming=3).orderBy("id_a", "id_b")


def q_simhash_md5(spark, sf_dir):
    """Deterministic 32-bit SimHash (md5 token hashes) — pure Catalyst
    (explode → 32 map-side-combinable bit sums → sign pack), fully
    SQL-expressible so the SimHash *semantics* (bit-majority packing) get
    an oracle even though the production simhash uses crc32 UDF hashing."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != F.lit("")
    )
    tok_tbl = docs.select("doc_id", F.explode(toks).alias("tok"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    sums = tok_tbl.withColumn("h", h).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(32)
        ]
    )
    simhash = None
    for b in range(32):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")) * F.lit(1 << b).cast("long")
        simhash = bit if simhash is None else simhash + bit
    return sums.select("doc_id", simhash.alias("simhash32"))


_MH_PERMS = [(999983, 12345), (999979, 54321), (999961, 11111), (999959, 77777)]
_MH_P = 2147483647


def q_minhash_md5(spark, sf_dir):
    """Deterministic MinHash (md5 3-gram shingle hashes, 4 fixed linear
    permutations mod 2^31-1) — pure Catalyst array algebra, so the MinHash
    signature/estimate semantics get a DuckDB oracle alongside the crc32
    production operator. est_jaccard over adjacent-id pairs."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0)))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, 3), " "))
    )
    hs = F.transform(grams, lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"))
    sig_cols = [
        F.array_min(F.transform(hs, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_MH_P))).alias(f"sig{i}")
        for i, (a, b) in enumerate(_MH_PERMS)
    ]
    sigs = docs.select("doc_id", *sig_cols)
    a = sigs.select(*[F.col(c).alias(c + "_a") for c in sigs.columns])
    b = sigs.select(*[F.col(c).alias(c + "_b") for c in sigs.columns])
    pairs = a.join(b, F.col("doc_id_a") + 1 == F.col("doc_id_b")).filter(
        F.col("doc_id_a") % 10 == 0
    )
    matches = sum(
        F.when(F.col(f"sig{i}_a") == F.col(f"sig{i}_b"), 1).otherwise(0)
        for i in range(len(_MH_PERMS))
    )
    return pairs.select(
        F.col("doc_id_a").alias("id_a"),
        F.col("doc_id_b").alias("id_b"),
        (matches / F.lit(float(len(_MH_PERMS)))).alias("est_jaccard"),
    )


def _md5_sig_table(docs):
    """Deterministic md5 MinHash signature table (id, sig array<long>) in
    pure Catalyst — the engine-portable stand-in for the production
    crc32-UDF signatures, shared by the incremental-probe query."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0)))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, 3), " "))
    )
    hs = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
    )
    sig = F.array(
        *[
            F.array_min(
                F.transform(hs, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_MH_P))
            )
            for a, b in _MH_PERMS
        ]
    )
    return docs.filter(F.trim(F.col("text")) != "").select(
        F.col("doc_id").alias("id"), sig.alias("sig")
    )


def q_minhash_incremental_probe(spark, sf_dir):
    """Incremental LSH probe (dedup.minhash_probe_pairs): standing =
    doc_id % 3 != 0, new = doc_id % 3 == 0, md5-deterministic 4-perm
    signatures, 2 bands × 2 rows, threshold 0.5. The oracle recomputes
    the BATCH LSH over the full corpus in DuckDB and restricts to pairs
    touching a new doc — so the probe path must agree with batch exactly
    (the equality contract minhash_probe_pairs pins; pytest checks it on
    the production UDF signatures, this query checks it cross-engine)."""
    from spider_spark.operators import dedup

    docs = _t(spark, sf_dir, "documents")
    sigs = _md5_sig_table(docs)
    standing = sigs.filter(F.col("id") % 3 != 0)
    new = sigs.filter(F.col("id") % 3 == 0)
    return dedup.minhash_probe_pairs(
        standing,
        new,
        num_perm=4,
        bands=2,
        jaccard_threshold=0.5,
        max_bucket_size=None,
    ).select("id_a", "id_b", F.round("est_jaccard", 4).alias("est_r"))


def q_fuzzy_decontaminate(spark, sf_dir):
    """Fuzzy benchmark decontamination (curation.fuzzy_decontaminate):
    MinHash-LSH between the corpus (doc_id % 5 != 0) and a benchmark
    sample (doc_id % 5 == 0), md5-deterministic 4-perm signatures
    injected via the sig-table seam, 2 bands × 2 rows, threshold 0.5.
    The oracle recomputes the batch LSH over the full corpus and keeps
    exactly the cross pairs — so the keyspace-tagged probe composition
    (corpus ids 2i, benchmark 2i+1, benchmark-internal pairs dropped)
    must agree with a direct cross-side LSH, cross-engine."""
    from spider_spark.operators import curation

    docs = _t(spark, sf_dir, "documents")
    sigs = _md5_sig_table(docs)
    corpus = sigs.filter(F.col("id") % 5 != 0)
    bench = sigs.filter(F.col("id") % 5 == 0)
    out = curation.fuzzy_decontaminate(
        num_perm=4,
        bands=2,
        jaccard_threshold=0.5,
        max_bucket_size=None,
        docs_sigs=corpus,
        benchmark_sigs=bench,
    )
    return out.select(
        "doc_id", "benchmark_id", F.round("est_jaccard", 4).alias("est_r")
    )


def q_winnowing_md5(spark, sf_dir):
    """Deterministic winnowing fingerprints (char 5-grams → md5 hashes →
    min per 4-window → distinct) in pure Catalyst array algebra — the
    window-min fingerprint semantics with a DuckDB oracle (the production
    operator uses a rolling Karp-Rabin UDF).

    The input is repartitioned to the session's parallelism first: the
    query is map-only but runs ~len(text)·w md5 evaluations per doc, so
    on a corpus that fits ONE parquet split the whole thing serializes
    onto a single task (observed: 15+ min at sf0.1 on one core while 7
    idled). At 100 TB the splits supply the parallelism; at bench scale
    the explicit exchange (a few MB) buys full-width codegen."""
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    txt = F.lower(F.trim(F.col("text")))
    n = F.length(txt)
    k, w = 5, 4
    gram_idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    hashes = F.transform(
        gram_idx, lambda i: F.conv(F.substring(F.md5(F.substring(txt, i, k)), 1, 8), 16, 10).cast("long")
    )
    win_idx = F.sequence(F.lit(1), F.greatest(F.size(hashes) - (w - 1), F.lit(1)))
    fps = F.array_distinct(F.transform(win_idx, lambda i: F.array_min(F.slice(hashes, i, w))))
    return docs.select("doc_id", F.size(fps).alias("n_fingerprints"))


def q_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard verify stage over adjacent-id candidate pairs."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("text_b"))
    pairs = a.join(b, a.id_a + 1 == b.id_b).filter(F.col("id_a") % 10 == 0)
    return (
        dedup.ngram_jaccard(pairs)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard_r"))
        .orderBy("id_a")
    )


def q_dup_ngram_coverage(spark, sf_dir):
    """Per-doc duplicate-span coverage: fraction of tokens inside a word
    5-gram shared with ≥2 distinct documents (fixed-length restatement of
    Lee et al. 2022 suffix-array span dedup — census → semi-join → span
    union, all joins + aggregates)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.dup_ngram_coverage(docs, n=5).orderBy("id")


def q_bpe_tokenize(spark, sf_dir):
    """Distributed BPE (Sennrich et al. 2016): train 12 merges on the
    corpus (word census touched once; every sweep runs on the
    vocabulary-bound census, argmax collected with lexicographic
    tie-break so the merge table is partitioning-invariant), then encode
    every document rank-greedily. Rows-only by driver necessity (training
    is iterative); exact ground truth is the pure-Python differential in
    tests/test_bpe.py (identical merge tables + encodings)."""
    from spider_spark.operators import bpe

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    merges = bpe.train_bpe(docs, num_merges=12)
    return bpe.encode_with_merges(docs, merges).orderBy("id")


#: literal merge table for the oracle-backed BPE-encode sibling — ranks
#: chosen to exercise cascades (th→the→the</w>) and the rank-greedy
#: ordering. MUST stay byte-identical to the VALUES list in the oracle.
BPE_FIXED_MERGES = [
    ("t", "h"),
    ("th", "e"),
    ("the", "</w>"),
    ("e", "</w>"),
    ("a", "n"),
    ("an", "d"),
    ("and", "</w>"),
    ("i", "n"),
]

#: literal BYTE-LEVEL merge table (GPT-2-style: 'Ġ' is the remapped space
#: byte) for the oracle-backed gpt2_bpe_encode_fixed query. Well-formed —
#: every non-base part is created by an earlier rank — so rank-greedy
#: encoding equals sequential-by-rank replay (the equivalence the oracle
#: rests on; pinned in tests/test_bpe_gpt2.py). MUST stay byte-identical
#: to the VALUES list in the oracle.
GPT2_FIXED_MERGES = [
    ("Ġ", "t"),
    ("h", "e"),
    ("Ġt", "he"),
    ("a", "b"),
    ("l", "e"),
    ("Ġt", "ab"),
    ("Ġtab", "le"),
    ("v", "a"),
    ("Ġ", "va"),
    ("Ġva", "l"),
    ("u", "e"),
    ("Ġval", "ue"),
]


def q_bpe_encode_fixed_merges(spark, sf_dir):
    """The deterministic oracle-backed sibling of bpe_tokenize (family
    discipline: minhash→minhash_deterministic): the SAME production
    encode path (bpe.encode_with_merges, rank-greedy) applied with a
    LITERAL 8-merge table instead of a trained one, so DuckDB can replay
    it exactly. The oracle exploits the classic equivalence that
    rank-greedy encoding equals applying merges sequentially in rank
    order (each left-to-right greedy): a recursive CTE carries
    (word, syms, merge_index) and either applies the current merge at
    its leftmost occurrence or advances the index — replaying the exact
    per-word token counts, then aggregating per document."""
    from spider_spark.operators import bpe

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bpe.encode_with_merges(docs, BPE_FIXED_MERGES).orderBy("id")


def q_gpt2_bpe_encode_fixed(spark, sf_dir):
    """Byte-level (GPT-2-style) BPE encode with a LITERAL merge table —
    the tokenizer family web-text training pipelines actually run
    (published: regex pre-tokenizer + bytes→unicode remap + rank-greedy
    merges; bpe.encode_gpt2). Oracle equivalence is exact BY CONSTRUCTION,
    not by data luck: both sides apply the same deterministic guard
    (printable-ASCII text with no double spaces), under which (a) the
    published pattern's backtracking ``\\s+(?!\\S)`` branch never fires,
    so the oracle's RE2-compatible pattern (DuckDB) splits identically —
    the full lookahead semantics are separately pinned against published
    examples in tests/test_bpe_gpt2.py — and (b) UTF-8 bytes are the
    chars, so the byte remap reduces to ``replace(' ', 'Ġ')``. The oracle
    replays the merges sequentially by rank (recursive CTE), equal to
    rank-greedy for this well-formed table."""
    from spider_spark.operators import bpe

    docs = (
        _t(spark, sf_dir, "documents")
        # NULL text coalesces to '' BEFORE the guard, mirroring the
        # oracle's coalesce — rlike(NULL) is NULL and would silently DROP
        # the row here while the oracle keeps it with zero counts
        .select("doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text"))
        .filter(F.col("text").rlike("^[ -~]*$") & ~F.col("text").rlike("  "))
    )
    return bpe.encode_gpt2(docs, GPT2_FIXED_MERGES).orderBy("id")


def q_main_content(spark, sf_dir):
    """jusText/Boilerpipe-style main-content extraction (pure Catalyst:
    block segmentation, link density, word-count classes, one context-
    promotion pass — `operators/content.py`). Deterministic synthetic
    pages: nav + two content blocks + link footer, where the second block
    carries the LAST doc_id%7 tokens — so across the corpus the classifier
    hits every class: absent (0), short-unpromotable (1-2 words),
    short-promoted (3-4, rescued by the good neighbor; when the split
    leaves the FIRST block short it gets rescued in the other direction),
    and good (5-6). The oracle encodes the same thresholds analytically."""
    from spider_spark.operators import content

    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    w2 = (F.col("doc_id") % 7).cast("int")
    w1 = (n - w2).cast("int")
    h1 = F.array_join(F.slice(toks, F.lit(1), w1), " ")
    h2 = F.when(w2 > 0, F.array_join(F.slice(toks, w1 + 1, w2), " ")).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><head><title>T</title></head><body>'
              '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav><p>'),
        h1, F.lit("</p><div>"), h2,
        F.lit('</div><footer><a href="/p">Privacy</a> <a href="/t">Terms</a></footer></body></html>'),
    )
    pages = docs.select(F.col("doc_id"), html.alias("html"))
    out = content.extract_main_content(pages, id_col="doc_id", html_col="html")
    return out.select(
        "id", "n_blocks", "n_good", "main_chars", F.md5("main_text").alias("main_md5")
    ).orderBy("id")


def q_wat_extract(spark, sf_dir):
    """WAT source connector + derivation (Common Crawl's metadata artifact,
    completing the WARC/WET/WAT trio): pages with analytically-built HTML
    go through warc.wat_from_html — the engine's reference-parity title
    and keep-first link extractors feed WAT metadata records (JSON
    envelopes) which are serialized and parsed back entirely inside
    executors. The HTML plants a duplicate href so keep-first dedupe is
    load-bearing, a quoted title so JSON escaping is load-bearing, and
    relative hrefs so WHATWG resolution against the page URL is
    load-bearing — the oracle reconstructs all three analytically."""
    from spider_spark import warc as warc_mod

    docs = _t(spark, sf_dir, "documents")
    body = F.aggregate(
        F.sequence(F.lit(0), F.pmod(F.col("doc_id"), F.lit(4))),
        F.lit(""),
        lambda acc, i: F.concat(
            acc, F.lit('<a href="/l/'), i.cast("string"), F.lit('">x</a>')
        ),
    )
    html = F.concat(
        F.lit("<html><head><title> Doc "),
        F.col("doc_id").cast("string"),
        F.lit(' "q" </title></head><body>'),
        body,
        F.lit('<a href="/l/0">dup</a></body></html>'),
    )
    pages = docs.select(
        F.concat(F.lit("https://wat.test/d/"), F.col("doc_id").cast("string")).alias(
            "url"
        ),
        F.timestamp_seconds(F.col("doc_id")).alias("warc_ts"),
        html.alias("html"),
    )
    out = warc_mod.wat_from_html(pages, compress=True)
    return out.select(
        "url",
        "title",
        F.size("links").cast("int").alias("n_links"),
        F.array_join("links", "|").alias("links_joined"),
    ).orderBy("url")


def q_wet_roundtrip(spark, sf_dir):
    """WET source connector (Common Crawl's extracted-text artifact,
    completing the WARC/CDX/WET trio): conversion records serialized and
    parsed back entirely inside executors. The text gets a hostile suffix
    containing a bare 'WARC/1.0' line + CRLFs, so the oracle only matches
    if framing is strictly Content-Length (payload never scanned for
    delimiters)."""
    from spider_spark import warc as warc_mod

    docs = _t(spark, sf_dir, "documents")
    hostile = F.concat(
        F.col("text"),
        F.lit("\nWARC/1.0\r\nContent-Length: 999\r\n\r\nnot a record"),
    )
    pages = docs.select(
        F.concat(F.lit("https://wet.test/doc/"), F.col("doc_id")).alias("url"),
        F.timestamp_seconds(F.col("doc_id")).alias("warc_ts"),
        hostile.alias("text"),
    )
    back = warc_mod.wet_roundtrip(pages, compress=True)
    return back.select(
        "url",
        F.length("text").cast("bigint").alias("n_chars"),
        F.md5("text").alias("text_md5"),
    ).orderBy("url")


def q_remove_dup_spans(spark, sf_dir):
    """Duplicate-span REMOVAL (the rewrite companion to dup_ngram_coverage,
    Lee et al. 2022 keep-first discipline): word 5-grams shared by ≥2 docs
    are removed everywhere except the owning (smallest-id) document, and
    the cleaned text is reassembled in original token order. Result ships
    the md5 of the cleaned text so the value compare stays narrow."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = dedup.remove_duplicate_spans(docs, n=5, min_docs=2)
    return out.select(
        "id", "n_tokens", "removed_tokens", F.md5("clean_text").alias("clean_md5")
    ).orderBy("id")


def q_bff_paragraph_dedupe(spark, sf_dir):
    """Dolma-BFF-style corpus-wide keep-first paragraph dedup with the
    bloom accelerator ON (the 100 TB path: unique paragraphs skip the
    owner join entirely via a broadcast bloom over duplicated-paragraph
    fingerprints; bloom false positives only cost extra exact-join rows,
    never a wrong drop — so the DuckDB keep-first oracle must match
    bit-for-bit). Docs are reflowed into 3-word lines (same regex reflow
    as line_dedup_c4) so the single-line corpus has real paragraphs."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace("text", r"((\S+ ){2}\S+) ", "$1\n").alias("text"),
    )
    out = dedup.bff_paragraph_dedup(docs, use_bloom=True)
    return out.select(
        "id", "n_paras", "n_removed", F.md5("clean_text").alias("clean_md5")
    ).orderBy("id")


def q_embedding_near_dups(spark, sf_dir):
    """LSH self-join + exact-cosine verify for embedding near-duplicates.

    Random embeddings in high dimension are nearly orthogonal, so at small
    SF the raw table has no pairs above 0.9 — union in deterministic
    perturbed copies of the first 8 corpus vectors (vec_id + 10^6, first
    component nudged by +0.01) so the operator provably recovers exactly
    those planted near-duplicates end-to-end."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.expr(
            "transform(embedding, (v, i) -> CAST(v AS FLOAT)"
            " + CASE WHEN i = 0 THEN CAST(0.01 AS FLOAT) ELSE CAST(0.0 AS FLOAT) END)"
        ).alias("embedding"),
    )
    return similarity.embedding_near_duplicates(
        emb.unionByName(planted), dim=64, cosine_threshold=0.9
    ).orderBy("id_a", "id_b")


def q_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN (the 100 TB path): probes meet corpus only inside
    matching hash buckets, exact cosine re-rank within candidates."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    out = similarity.lsh_topk(
        emb.filter(F.col("vec_id") >= 4), probes, dim=64, k=5, num_planes=6, num_tables=8
    )
    return out.select("probe_id", "vec_id", F.round("cosine", 4).alias("cosine_r"), "rank")


def q_ppm_decode(spark, sf_dir):
    """REAL image decode (netpbm P6 parsed by hand in the mapInPandas
    kernel): dimensions and the red-channel mean come from actually
    decoding the pixel bytes; the oracle reconstructs both analytically
    from the deterministic gradient pattern."""
    media = multimodal.generate_ppm_images(spark, 64)
    feats = multimodal.extract_image_features(media)
    return feats.select(
        "media_id", "width", "height",
        F.round(F.element_at("embedding", 1).cast("double"), 3).alias("red_mean"),
    )


def q_png_decode(spark, sf_dir):
    """REAL PNG decode (from-scratch stdlib-zlib decoder over the public
    W3C spec: chunk walk + CRC, scanline unfilter cycling through all five
    filter types across the corpus): dimensions, red-channel mean, and the
    constant blue channel come from actually inflating and unfiltering the
    pixel bytes; the oracle reconstructs all of them analytically from the
    deterministic gradient pattern."""
    media = multimodal.generate_png_images(spark, 80)
    feats = multimodal.extract_image_features(media)
    return feats.select(
        "media_id", "width", "height",
        F.round(F.element_at("embedding", 1).cast("double"), 3).alias("red_mean"),
        # blue is a constant plane (id % 256)/255 in the generator — a
        # whole-image invariant that only a correct unfilter reproduces
        F.round(F.element_at("embedding", 3).cast("double"), 4).alias("blue_mean"),
    )


def q_gif_decode(spark, sf_dir):
    """REAL GIF decode (from-scratch LZW + palette + interlace over the
    public GIF89a spec, `operators/imagecodecs.py`): dimensions, the
    red-gradient mean, and the constant blue plane come from actually
    LZW-decompressing and palette-expanding the pixel bytes — odd ids are
    interlaced, so the oracle only matches if the row reordering is right.
    The oracle reconstructs everything analytically from the deterministic
    pattern."""
    media = multimodal.generate_gif_images(spark, 64)
    feats = multimodal.extract_image_features(media)
    return feats.select(
        "media_id", "width", "height",
        F.round(F.element_at("embedding", 1).cast("double"), 3).alias("red_mean"),
        F.round(F.element_at("embedding", 3).cast("double"), 4).alias("blue_mean"),
    )


def q_jpeg_decode(spark, sf_dir):
    """REAL baseline-JPEG decode (ITU T.81 Huffman + dequant + IDCT,
    `operators/imagecodecs.py`): the corpus is flat-color rasters encoded
    at quality 100, where the decode is bit-EXACT (zero AC energy,
    all-ones quant tables) — so the channel means are exact integers the
    oracle reproduces analytically. Lossy settings are pytest-covered
    (test_imagecodecs.py / test_multimodal_codecs.py)."""
    media = multimodal.generate_jpeg_images(spark, 64)
    feats = multimodal.extract_image_features(media)
    return feats.select(
        "media_id", "width", "height",
        F.round(F.element_at("embedding", 1).cast("double") * 255, 0).cast("int").alias("mean_r"),
        F.round(F.element_at("embedding", 2).cast("double") * 255, 0).cast("int").alias("mean_g"),
        F.round(F.element_at("embedding", 3).cast("double") * 255, 0).cast("int").alias("mean_b"),
    )


def q_gif_video_frames(spark, sf_dir):
    """REAL video frame sampling: animated GIFs (3 + id%4 flat-color
    frames) decoded frame-by-frame with per-frame composition, sampled at
    evenly spaced indices floor(fi·n/3), sampled frames re-encoded as P6
    and re-decoded by frame_stats — two real codec passes per row. Flat
    frames make every channel mean exact, so the whole chain is
    oracle-checkable."""
    media = multimodal.generate_gif_videos(spark, 32)
    frames = multimodal.sample_video_frames(media, frames_per_video=3)
    return multimodal.frame_stats(frames)


def q_wav_features(spark, sf_dir):
    """REAL audio decode (stdlib wave + numpy FFT): duration and dominant
    frequency from actually decoding the PCM payload; oracle reconstructs
    them from the synth parameters (sine at 200+(id%40)*50 Hz, 250 ms)."""
    media = multimodal.generate_wav_audio(spark, 48)
    feats = multimodal.extract_audio_features(media)
    return feats.select(
        "media_id", "duration_ms",
        (F.round(F.col("dominant_hz") / 50) * 50).cast("int").alias("dominant_hz_bin"),
    )


def q_multimodal_features(spark, sf_dir):
    """Binary media columns → typed features via mapInPandas (decode stubbed
    deterministically; Spark-side schema/partitioning/batch shape real)."""
    media = multimodal.generate_media(spark, 64, kind="image")
    feats = multimodal.extract_image_features(media, out_dim=8)
    return feats.select(
        "media_id", "width", "height", F.round(F.element_at("embedding", 1), 4).alias("e0")
    ).orderBy("media_id")


def q_video_frames(spark, sf_dir):
    media = multimodal.generate_media(spark, 16, kind="video")
    frames = multimodal.sample_video_frames(media, frames_per_video=3)
    return frames.select("media_id", "frame_idx", F.sha2(F.col("frame"), 256).alias("frame_hash")).orderBy(
        "media_id", "frame_idx"
    )


def q_video_container_meta(spark, sf_dir):
    """MP4/ISO-BMFF container metadata WITHOUT decoding a frame: the real
    box walk (moov/mvhd duration+timescale, trak/tkhd 16.16 display size,
    track count) over deterministic hand-built containers
    (`imagecodecs.build_mp4`). What a training pipeline wants from video
    at 100 TB — duration/size/track screening — needs the container
    structure only; frame decode stays honestly stubbed (no video codec
    in the sandbox)."""
    media = multimodal.generate_mp4_videos(spark, 32)
    return multimodal.extract_video_metadata(media).orderBy("media_id")


def q_winnowing(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    fp = textqc.winnowing_fingerprints_udf(k=5, window=4)
    return docs.select("doc_id", F.size(fp(F.col("text"))).alias("n_fingerprints")).orderBy("doc_id")


def q_ivf_topk(spark, sf_dir):
    """IVF-style ANN (inverted-list scale path): centroid assignment is a
    map-only codegen fold over an inlined centroid literal (corpus never
    shuffles), probes visit only the 4 nearest of 16 lists, exact cosine
    re-rank within candidates. Default deterministic centroids (smallest
    corpus ids) make the whole plan DuckDB-expressible."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    out = similarity.ivf_topk(
        emb.filter(F.col("vec_id") >= 4), probes, k=5, n_centroids=16, n_probe=4
    )
    return out.select("probe_id", "vec_id", F.round("cosine", 4).alias("cosine_r"), "rank")


def q_repetition_signals(spark, sf_dir):
    """Gopher-style repetition quality signals (arXiv:2112.11446 §A1.1):
    in-doc word/bigram repetition fractions (pure codegen) + modal-bigram
    occupancy (explode→partial-agg, never per-doc Python)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return textqc.repetition_signals(docs).orderBy("doc_id")


def q_boilerplate_ngrams(spark, sf_dir):
    """Corpus-level boilerplate census (CCNet/C4 shared-shingle idea):
    3-grams appearing in ≥5 distinct docs are boilerplate; each doc reports
    the fraction of its gram occurrences that are boilerplate."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return textqc.boilerplate_ngrams(docs, ngram_n=3, min_docs=5).orderBy("doc_id")


def q_line_dedup(spark, sf_dir):
    """C4-rule corpus line dedup: any normalized line occurring ≥3 times
    across the corpus is removed from every document. The single-line
    synthetic docs are first reflowed into 3-word lines by a pure-regex
    wrap (identical semantics in Spark and the DuckDB oracle), giving a
    corpus with real cross-document duplicate lines to remove."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace("text", r"((\S+ ){2}\S+) ", "$1\n").alias("text"),
    )
    return textqc.line_dedup(docs, min_count=3).orderBy("doc_id")


def q_gopher_quality(spark, sf_dir):
    """The complete Gopher appendix-A1.1 quality rule set (word-count and
    mean-word-length bands, symbol ratio, bullet/ellipsis line fractions,
    alphabetic-word ratio, 8-stop-word rule) as one codegen projection.
    Every 4th doc gets deterministic bullet/ellipsis lines appended so the
    line-fraction rules are exercised on the single-line synthetic corpus."""
    docs = _t(spark, sf_dir, "documents")
    text2 = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(
            F.col("text"),
            F.lit("\n- bullet alpha\n- bullet beta\ntrailing thought..."),
        ),
    ).otherwise(F.col("text"))
    return textqc.gopher_quality_flags(
        docs.select("doc_id", text2.alias("text"))
    ).orderBy("doc_id")


def q_url_filters(spark, sf_dir):
    """RefinedWeb/C4-style pre-fetch URL screen: blocked-domain suffix
    match (dot-boundary), badword substring, non-content asset extension —
    first-match-wins, pure projection. URLs constructed deterministically
    per doc_id to hit every branch."""
    from spider_spark.operators import curation

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    host = (
        F.when(did % 7 == 0, F.concat(F.lit("ex"), did, F.lit(".casino.test")))
        .when(did % 7 == 1, F.lit("sub.spamfarm.test"))
        .otherwise(F.concat(F.lit("site"), did % 50, F.lit(".test")))
    )
    path = (
        F.when(did % 5 == 0, F.lit("/assets/app.js"))
        .when(did % 5 == 1, F.lit("/phishing/login"))
        .when(did % 5 == 2, F.concat(F.lit("/article/"), did))
        .when(did % 5 == 3, F.lit("/style/main.css"))
        .otherwise(F.concat(F.lit("/page/"), did, F.lit("?utm=1")))
    )
    urls = docs.select("doc_id", F.concat(F.lit("https://"), host, path).alias("url"))
    return curation.url_filters(urls).orderBy("doc_id")


def q_c4_line_filters(spark, sf_dir):
    """The C4 §2.2 line/page cleaning rules over a deterministic multi-line
    construction (terminal-punct + ≥5-word + no-javascript line rules;
    curly-brace / lorem-ipsum / too-few-lines page drops, first-match-wins)."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    text = F.concat_ws(
        "\n",
        F.concat(F.lit("the quick brown fox jumps over doc "), did, F.lit(".")),
        F.lit("short line"),
        F.concat(
            F.lit("every good sentence ends with punctuation number "),
            did % 7,
            F.lit("!"),
        ),
        F.lit("enable javascript to view the archive of this page."),
        F.concat(
            F.lit("a third proper sentence keeps the page alive number "),
            did % 5,
            F.lit("?"),
        ),
        F.when(
            did % 11 == 0, F.lit("filler lorem ipsum dolor sit amet line here.")
        ).otherwise(F.lit("an ordinary closing sentence wraps the document here.")),
        F.when(did % 13 == 0, F.lit("code { sample }")).otherwise(F.lit("")),
    )
    return textqc.c4_line_filters(docs.select("doc_id", text.alias("text"))).orderBy(
        "doc_id"
    )


def q_pii_redact(spark, sf_dir):
    """Dolma/ROOTS-style PII masking: emails, dotted-quad IPs, and
    NANP-shaped phone numbers counted then masked with Dolma's public
    replacement tokens, entirely in codegen regexp over the scan. PII is
    planted deterministically per doc_id so both engines see identical
    inputs (the synthetic corpus itself contains none)."""
    from spider_spark.operators import curation

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact doc"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1 call 202-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return curation.redact_pii(docs).orderBy("doc_id")


def q_embedding_near_dups_exact(spark, sf_dir):
    """Exact (all-pairs) embedding near-duplicate baseline over the same
    planted-perturbation corpus as `embedding_near_dups` — the oracle this
    checks against IS the ground truth the LSH path is recall-measured on.
    Sampled to vec_id < 1000: the exact path is for recall measurement on
    samples by definition; the quadratic stage must not grow with sf."""
    emb = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 1000)
        .select("vec_id", "embedding")
    )
    planted = emb.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.expr(
            "transform(embedding, (v, i) -> CAST(v AS FLOAT)"
            " + CASE WHEN i = 0 THEN CAST(0.01 AS FLOAT) ELSE CAST(0.0 AS FLOAT) END)"
        ).alias("embedding"),
    )
    out = similarity.exact_near_duplicates(
        emb.unionByName(planted), cosine_threshold=0.9
    )
    return out.select(
        "id_a", "id_b", F.round("cosine", 4).alias("cosine_r")
    ).orderBy("id_a", "id_b")


def q_lsh_recall(spark, sf_dir):
    """Recall of the deterministic md5-MinHash detector against the exact
    3-gram Jaccard ground truth over a planted-pair universe — the
    oracle-checkable form of the recall gate (tests/test_lsh_recall.py
    asserts floors for the production crc32/hyperplane LSH operators
    against their exact baselines; this query pins the recall COMPUTATION
    itself to a DuckDB oracle). Universe: adjacent-id background pairs
    (doc_id%10==0, mostly dissimilar) plus planted near-dups (doc_id%10==5
    paired with itself + one appended token → jaccard (T-2)/(T-1)).
    Output: one row (n_pairs, n_exact, n_hit, recall_r)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("text_b"))
    adj = a.join(b, F.col("id_a") + 1 == F.col("id_b")).filter(F.col("id_a") % 10 == 0)
    planted = docs.filter(F.col("doc_id") % 10 == 5).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + F.lit(1_000_000)).alias("id_b"),
        F.col("text").alias("text_a"),
        F.concat(F.col("text"), F.lit(" zzzz")).alias("text_b"),
    )
    pairs = dedup.ngram_jaccard(adj.unionByName(planted))

    def mh_sigs(tcol: str):
        toks = F.split(F.lower(F.trim(F.col(tcol))), r"\s+")
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0)))
        grams = F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, 3), " "))
        )
        hs = F.transform(
            grams, lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        )
        return [
            F.array_min(F.transform(hs, lambda h: (F.lit(aa) * h + F.lit(bb)) % F.lit(_MH_P)))
            for (aa, bb) in _MH_PERMS
        ]

    sa, sb = mh_sigs("text_a"), mh_sigs("text_b")
    est = sum(
        F.when(x == y, 1).otherwise(0) for x, y in zip(sa, sb)
    ) / F.lit(float(len(_MH_PERMS)))
    scored = pairs.withColumn("est", est)
    is_exact = (F.col("jaccard") >= 0.5).cast("int")
    is_hit = ((F.col("jaccard") >= 0.5) & (F.col("est") >= 0.5)).cast("int")
    return scored.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(is_exact).alias("n_exact"),
        F.sum(is_hit).alias("n_hit"),
    ).select(
        "n_pairs",
        "n_exact",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_exact"), 4).alias("recall_r"),
    )


def q_warc_roundtrip(spark, sf_dir):
    """WARC source connector (Common Crawl's interchange format,
    ISO 28500): pages → WARC response records → parsed back, entirely
    inside executors (one blob per Arrow batch; no driver collect, no
    filesystem). Output proves byte-framing fidelity (payload octet
    length) and content fidelity (title re-extracted from the
    roundtripped HTML)."""
    from spider_spark import warc as warc_mod

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("https://warc.test/doc/"), F.col("doc_id")).alias("url"),
        F.timestamp_seconds(F.col("doc_id")).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>Doc "),
                F.col("doc_id"),
                F.lit("</title></head><body><p>"),
                F.col("text"),
                F.lit("</p></body></html>"),
            ),
            "utf-8",
        ).alias("html"),
    )
    back = warc_mod.roundtrip_pages(pages, compress=True)
    return back.select(
        "url",
        F.length("html").cast("bigint").alias("n_bytes"),
        F.regexp_extract(F.col("html").cast("string"), "<title[^>]*>([^<]+)</title>", 1).alias(
            "title"
        ),
    )


def q_sitemap_extract(spark, sf_dir):
    """Sitemap protocol extraction (sitemaps.org), pure Catalyst: urlset
    blocks → (loc, lastmod, priority) rows with XML entities unescaped
    (&amp; last — no double-decode)."""
    from spider_spark import sitemap as sitemap_mod

    docs = _t(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"><url><loc>'
              "https://site.test/p/"),
        F.col("doc_id"),
        F.lit("?a=1&amp;b="),
        F.col("doc_id"),
        F.lit("</loc><lastmod>2024-03-0"),
        F.col("doc_id") % 9 + 1,
        F.lit("</lastmod><priority>0."),
        F.col("doc_id") % 10,
        F.lit("</priority></url><url><loc>https://site.test/alt/"),
        F.col("doc_id"),
        F.lit("</loc></url></urlset>"),
    )
    sitemaps = docs.select(
        F.concat(F.lit("https://site.test/sm/"), F.col("doc_id")).alias("url"),
        xml.alias("xml"),
    )
    return sitemap_mod.sitemap_entries(sitemaps, "xml").select(
        "url", "pos", "loc", "lastmod", "priority"
    )


def q_sitemap_revalidation(spark, sf_dir):
    """Sitemap-driven recrawl selection: the REAL XML extraction feeds
    revalidation_candidates. Even doc_ids declare lastmod (authoritative),
    odd ones only changefreq; every 5th URL was never crawled. The oracle
    recomputes the reason chain from the same deterministic construction."""
    from spider_spark import sitemap as sitemap_mod

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    meta = F.when(
        did % 2 == 0,
        F.concat(F.lit("<lastmod>2024-03-0"), did % 9 + 1, F.lit("</lastmod>")),
    ).otherwise(
        F.concat(
            F.lit("<changefreq>"),
            F.element_at(
                F.array(*[F.lit(x) for x in ("hourly", "daily", "weekly", "monthly", "yearly", "never")]),
                (did % 6 + 1).cast("int"),
            ),
            F.lit("</changefreq>"),
        )
    )
    xml = F.concat(
        F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
              "<url><loc>https://site.test/p/"),
        did,
        F.lit("</loc>"),
        meta,
        F.lit("</url></urlset>"),
    )
    sitemaps = docs.select(
        F.concat(F.lit("https://site.test/sm/"), did).alias("url"), xml.alias("xml")
    )
    entries = sitemap_mod.sitemap_entries(sitemaps, "xml")
    last_crawl = docs.filter(did % 5 != 0).select(
        F.concat(F.lit("https://site.test/p/"), did).alias("url"),
        F.expr(
            "timestampadd(DAY, CAST((doc_id + 4) % 9 AS INT),"
            " timestamp'2024-03-01 00:00:00')"
        ).alias("last_crawled_at"),
    )
    out = sitemap_mod.revalidation_candidates(
        entries, last_crawl, "2024-03-10 00:00:00"
    )
    # timestamps leave the contract as formatted strings (same precedent as
    # events_hourly_rollup's epoch longs: pandas datetime unit mismatches
    # between engines must not reach the value compare)
    return out.select(
        "url",
        "reason",
        F.date_format("lastmod_ts", "yyyy-MM-dd HH:mm:ss").alias("lastmod_s"),
        F.date_format("last_crawled_at", "yyyy-MM-dd HH:mm:ss").alias("crawled_s"),
    ).orderBy("url")


def q_robots_sitemaps(spark, sf_dir):
    """Sitemap directive extraction from robots.txt bodies (RFC 9309 §2.3
    non-group record) — how a crawl discovers a host's sitemaps. Pure
    Catalyst (regexp_extract_all + keep-first array_distinct)."""
    from spider_spark import robots as robots_mod

    docs = _t(spark, sf_dir, "documents")
    bodies = docs.select(
        F.concat(F.lit("h"), F.col("doc_id"), F.lit(".test")).alias("host"),
        F.concat(
            F.lit("User-agent: *\nDisallow: /private\nSitemap: https://h"),
            F.col("doc_id"),
            F.lit(".test/sitemap.xml\nsitemap: https://h"),
            F.col("doc_id"),
            F.lit(".test/sitemap-news.xml\nSitemap: https://h"),
            F.col("doc_id"),
            F.lit(".test/sitemap.xml\n"),  # duplicate → keep-first
        ).alias("robots_txt"),
    )
    return robots_mod.sitemap_urls_from_bodies(bodies)


def q_cdx_index(spark, sf_dir):
    """CDX-style archive index (the WARC companion artifact): SURT key
    (reversed host labels + sorted query), 14-digit timestamp, sha256
    digest — sorted by (surt, ts) so each output file holds a contiguous
    SURT range at scale."""
    from spider_spark import warc as warc_mod

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(
            F.lit("https://www.ex"),
            F.col("doc_id") % 50,
            F.lit(".example.com/p/"),
            F.col("doc_id"),
            F.lit("?b=2&a=1"),
        ).alias("url"),
        F.timestamp_seconds(F.col("doc_id")).alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
    )
    return warc_mod.cdx_index(pages)


def q_cdx_lookup(spark, sf_dir):
    """Archive lookup over a CDX index (warc.cdx_lookup): SURT path-prefix
    queries equi-joined on the host key (never a nested-loop startswith
    scan), prefix test as a post-join codegen filter, latest_only via one
    partial-agg max_by — the CDX-server `limit=1 sort=reverse` idiom. Two
    captures exist per URL (generation 0/1, different digests); prefixes
    select the /p/1* path cohort per host."""
    from spider_spark import warc as warc_mod

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    caps = docs.select(d.alias("doc_id"), "text", F.lit(0).alias("g")).unionAll(
        docs.select(d.alias("doc_id"), "text", F.lit(1).alias("g"))
    )
    pages = caps.select(
        F.concat(
            F.lit("https://www.ex"),
            F.col("doc_id") % 50,
            F.lit(".example.com/p/"),
            F.col("doc_id"),
            F.lit("?b=2&a=1"),
        ).alias("url"),
        F.timestamp_seconds(F.col("doc_id") + F.col("g") * 1000000).alias("warc_ts"),
        F.encode(
            F.when(F.col("g") == 0, F.col("text")).otherwise(F.concat(F.col("text"), F.lit("!"))),
            "utf-8",
        ).alias("html"),
    )
    index = warc_mod.cdx_index(pages)
    prefixes = docs.select(
        F.concat(F.lit("com,example,ex"), d % 50, F.lit(",www)/p/1")).alias("prefix")
    ).distinct()
    return warc_mod.cdx_lookup(index, prefixes, latest_only=True)


def q_revisit_plan(spark, sf_dir):
    """Archive-side dedup (WARC 1.1 §6.7.2 revisit records,
    warc.revisit_plan): identical payloads store ONCE — the earliest
    capture per digest becomes the response record, every later identical
    capture a bodiless revisit pointing at it. One partial-agg groupBy on
    the digest + one equi-join; payloads hash once and never shuffle
    twice. 97 payload groups planted across the documents table."""
    from spider_spark import warc as warc_mod

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    pages = docs.select(
        F.concat(F.lit("https://h"), d % 7, F.lit(".test/p/"), d).alias("url"),
        F.timestamp_seconds(d).alias("warc_ts"),
        F.encode(F.concat(F.lit("payload-"), d % 97), "utf-8").alias("html"),
    )
    return warc_mod.revisit_plan(pages).select("url", "kind", "digest", "refers_to_url")


def q_strip_tracking(spark, sf_dir):
    """Tracking-param stripping (utm_*, gclid, fbclid, …) as a pure-Catalyst
    canonicalization step ahead of the seen-filter — per-campaign aliases of
    one page collapse to one frontier identity."""
    docs = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("https://t.test/p/"),
        F.col("doc_id"),
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("?utm_source=news&id="), F.col("doc_id")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("?id="), F.col("doc_id"), F.lit("&gclid=x")))
        .when(F.col("doc_id") % 4 == 2, F.lit(""))
        .otherwise(F.concat(F.lit("?fbclid=f"), F.col("doc_id"))),
    )
    return docs.select(
        "doc_id",
        raw.alias("url"),
        udfs.col_strip_tracking_params(raw).alias("stripped"),
    )


def q_clean_corpus(spark, sf_dir):
    """C4/Gopher-style cleaning disposition: first-match-wins drop-reason
    chain (too_short → lang → repetition → duplicate) composing the
    token-count, language-ID, repetition, and exact-dup operators into a
    per-doc keep/drop ledger."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return textqc.clean_corpus(docs).orderBy("doc_id")


def q_stupid_backoff_ppl(spark, sf_dir):
    """Stupid Backoff trigram scoring (Brants et al. 2007): train the
    count tables on the even-doc_id half of the corpus, score the odd
    half — the held-out split forces all three backoff branches (trigram
    hit, bigram backoff, Lidstone-floored OOV base) to fire, which a
    self-scored corpus never would. Counting = three groupBys over the
    reference; scoring = one scan of the held-out docs through five
    broadcast equi-joins + one per-doc aggregation."""
    from spider_spark.operators import lm as lmod

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    reference = docs.filter(F.col("doc_id") % 2 == 0)
    held_out = docs.filter(F.col("doc_id") % 2 == 1)
    out = lmod.doc_stupid_backoff(held_out, reference)
    return out.select(
        "doc_id",
        "n_trigrams",
        F.round("sb_nats", 6).alias("sb_nats_r"),
    ).orderBy("doc_id")


def q_kneser_ney_ppl(spark, sf_dir):
    """Interpolated Kneser-Ney bigram scoring (lm.doc_kneser_ney; Chen &
    Goodman 1998 eq. 4.26-4.27 — the KenLM smoothing family behind
    CCNet's perplexity filter): census the even-doc_id half, score the
    odd half, so unseen bigrams, unseen contexts, and unseen
    continuations all fire. One reference shuffle for the census,
    partial-agg fertility/continuation sweeps over census rows, scoring
    via three broadcast-gated equi-joins + one per-doc aggregation. The
    oracle replays census → continuation smoothing → interpolation
    end-to-end."""
    from spider_spark.operators import lm as lmod

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    reference = docs.filter(F.col("doc_id") % 2 == 0)
    held_out = docs.filter(F.col("doc_id") % 2 == 1)
    out = lmod.doc_kneser_ney(held_out, reference)
    return out.select(
        "doc_id",
        "n_bigrams",
        F.round("kn_nats", 6).alias("kn_nats_r"),
    ).orderBy("doc_id")


def q_perplexity_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing: train a Lidstone-smoothed unigram
    LM on the corpus, score every document (cross-entropy nats/token), and
    assign head/middle/tail buckets at fixed thresholds (the deployment
    style — cuts computed once, reused across shards). Train = one
    aggregation; score = broadcast vocab join + one per-doc aggregation."""
    from spider_spark.operators import lm as lmod

    docs = _t(spark, sf_dir, "documents")
    model = lmod.unigram_lm(docs)
    scored = lmod.doc_cross_entropy(docs, model)
    out = lmod.perplexity_buckets(scored, thresholds=(3.40, 3.45))
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("ce_nats", 6).alias("ce_r"),
        "ppl_bucket",
    ).orderBy("doc_id")


def q_feed_extract(spark, sf_dir):
    """RSS 2.0 + Atom feed extraction (feeds.feed_entries), pure Catalyst:
    item/entry blocks → (title, link, guid, published) rows. Even doc_ids
    publish RSS (CDATA title kept verbatim, entity-decoded link text,
    RFC 822 pubDate with the banned-in-Spark day-name token stripped before
    parsing); odd doc_ids publish Atom (href ATTRIBUTE with rel=alternate
    preferred over rel=self, RFC 3339 published)."""
    from spider_spark import feeds

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    rss = F.concat(
        F.lit('<rss version="2.0"><channel><item>'
              "<title><![CDATA[Post & co #"),
        d,
        F.lit("]]></title><link>https://ex.test/p/"),
        d,
        F.lit("?a=1&amp;b=2</link><pubDate>Mon, 02 Jan 2006 15:04:0"),
        d % 10,
        F.lit(" GMT</pubDate><guid>tag:ex,"),
        d,
        F.lit("</guid></item></channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom"><entry><title>Entry '),
        d,
        F.lit('</title><link rel="self" href="https://ex.test/feed.xml"/>'
              '<link rel="alternate" href="https://ex.test/a/'),
        d,
        F.lit('"/><id>urn:'),
        d,
        F.lit("</id><published>2021-07-1"),
        d % 9 + 1,
        F.lit("T08:09:10Z</published></entry></feed>"),
    )
    feeds_df = docs.select(
        F.concat(F.lit("https://ex.test/feed/"), d).alias("url"),
        F.when(d % 2 == 0, rss).otherwise(atom).alias("xml"),
    )
    out = feeds.feed_entries(feeds_df)
    return out.select(
        "url",
        "feed_kind",
        "pos",
        "title",
        "link",
        "guid",
        F.date_format("published_ts", "yyyy-MM-dd HH:mm:ss").alias("published"),
    )


def q_feed_discovery(spark, sf_dir):
    """Feed autodiscovery from page HTML: <link rel=alternate type=rss/atom>
    tags → (page_url, feed_url, feed_type), attribute order and quoting
    style varying by doc_id, stylesheet links ignored, keep-first dedupe.
    The hrefs are absolute so the WHATWG-resolution passthrough is
    oracle-expressible."""
    from spider_spark import feeds

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    html = F.concat(
        F.lit('<html><head><link rel="stylesheet" href="/s.css">'),
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit('<link rel="alternate" type="application/rss+xml" href="https://h'),
                d % 7,
                F.lit(".test/rss/"),
                d,
                F.lit('">'),
            ),
        ).otherwise(
            F.concat(
                F.lit("<link href='https://h"),
                d % 7,
                F.lit(".test/atom/"),
                d,
                F.lit("' type='application/atom+xml' rel='alternate'/>"),
            )
        ),
        F.lit("</head></html>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://h"), d % 7, F.lit(".test/page/"), d).alias("url"),
        html.alias("html"),
    )
    return feeds.discover_feed_urls(pages)


def q_charset_decode(spark, sf_dir):
    """Charset sniff + decode over binary HTML (the html:binary input
    contract): WHATWG-subset precedence BOM > Content-Type header > meta
    prescan > windows-1252 fallback. Payloads are generated in four real
    encodings (utf-8/meta, windows-1252/header-latin1-alias, utf-16-le/BOM,
    undeclared 0x80 byte); the oracle reconstructs the decoded strings
    analytically."""
    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

    from spider_spark import charset as csmod

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("html", BinaryType()),
        StructField("content_type", StringType()),
    ])

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                v = i % 4
                if v == 0:
                    html = f"<meta charset=utf-8><p>café ☃ {i}</p>".encode("utf-8")
                    ct = None
                elif v == 1:
                    html = f"<p>café {i}</p>".encode("windows-1252")
                    ct = "text/html; charset=latin1"
                elif v == 2:
                    html = ("\ufeff" + f"wide {i}").encode("utf-16-le")
                    ct = None
                else:
                    html = f"euro \x80 {i}".encode("latin-1")
                    ct = None
                rows.append({"doc_id": i, "html": html, "content_type": ct})
            yield pd.DataFrame(rows, columns=["doc_id", "html", "content_type"])

    raw = docs.mapInPandas(gen, schema)
    out = csmod.decode_html_bytes(raw, "html", "content_type")
    return out.select("doc_id", "charset", "text").orderBy("doc_id")


def q_host_reputation(spark, sf_dir):
    """Host/domain reputation rollup (RefinedWeb-style domain curation):
    per-doc keep verdict (≥30 whitespace tokens) and score
    (min(1, tokens/100)) aggregated per source → keep_rate · mean_score."""
    from spider_spark.operators import curation

    docs = _t(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != "")
    )
    d = docs.select(
        F.col("source").alias("host"),
        (toks >= 30).alias("keep"),
        F.least(F.lit(1.0), toks / F.lit(100.0)).alias("score"),
    )
    return curation.host_reputation(d, "host", "keep", "score").orderBy("host")


def q_meta_robots(spark, sf_dir):
    """In-page robots directives (metarobots.py): <meta name=robots>
    noindex/nofollow/none parsing across quoting styles + attribute order,
    link-level rel=nofollow/ugc/sponsored detection, rel=canonical href
    extraction, and meta-refresh (client-side redirect) parsing — all pure
    Catalyst. HTML variants are generated per doc_id; the oracle
    reconstructs the expected verdicts analytically."""
    from spider_spark.metarobots import (
        col_canonical_href,
        col_meta_refresh,
        col_meta_robots,
        col_rel_nofollow,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    v = (F.col("doc_id") % 6).cast("int")
    html = (
        F.when(v == 0, F.lit("<html><p>plain</p></html>"))
        .when(v == 1, F.lit('<html><meta name="robots" content="noindex"><p>a</p>'))
        .when(v == 2, F.lit("<html><meta name='robots' content='nofollow'><p>b</p>"))
        .when(
            v == 3,
            F.lit('<html><meta name=robots content="noindex, nofollow"><p>c</p>'),
        )
        .when(v == 4, F.lit('<html><META NAME="ROBOTS" CONTENT="none"><p>d</p>'))
        .otherwise(F.lit('<html><meta content=nofollow name="robots"><p>e</p>'))
    )
    rel = (
        F.when(F.col("doc_id") % 4 == 1, F.lit("nofollow"))
        .when(F.col("doc_id") % 4 == 2, F.lit("external ugc"))
        .when(F.col("doc_id") % 4 == 3, F.lit("external"))
        .otherwise(F.lit(None).cast("string"))
    )
    c = (F.col("doc_id") % 5).cast("int")
    canon_html = (
        F.when(c == 1, F.lit('<link rel="canonical" href="https://c.test/a">'))
        .when(c == 2, F.lit("<link href='/b' rel='canonical alternate'>"))
        .when(c == 3, F.lit("<link rel=canonical href=/c>"))
        .when(c == 4, F.lit('<link rel="stylesheet" href="/nope.css">'))
        .otherwise(F.lit("<p>no link</p>"))
    )
    r = (F.col("doc_id") % 3).cast("int")
    refresh_html = (
        F.when(r == 1, F.lit('<meta http-equiv="refresh" content="0; url=/next">'))
        .when(
            r == 2,
            F.lit("<meta http-equiv=REFRESH content='5;URL=\"https://r.test/x\"'>"),
        )
        .otherwise(F.lit("<p>no refresh</p>"))
    )
    m = col_meta_robots(html)
    rf = col_meta_refresh(refresh_html)
    return docs.select(
        "doc_id",
        m.getField("noindex").alias("noindex"),
        m.getField("nofollow").alias("nofollow"),
        col_rel_nofollow(rel).alias("link_nofollow"),
        col_canonical_href(canon_html).alias("canonical_href"),
        rf.getField("delay").alias("refresh_delay"),
        rf.getField("url").alias("refresh_url"),
    ).orderBy("doc_id")


_MIXTURE_WEIGHTS = {"src0": 3.0, "src1": 1.0, "src2": 1.0, "src3": 0.5}


def _docs_with_tokens(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != "")
    )
    return docs.select("doc_id", "source", toks.cast("long").alias("n_tokens"))


def q_token_mixture(spark, sf_dir):
    """Token-budget mixture planning (Pile/Dolma-style source recipes):
    per-source token inventories vs target weights over a 5000-token
    budget, with sampling rates capped at 2 epochs and unreachable targets
    flagged instead of silently under-delivered."""
    from spider_spark.operators import curation

    d = _docs_with_tokens(spark, sf_dir)
    return curation.token_budget_mixture(
        d, _MIXTURE_WEIGHTS, budget_tokens=5000, max_epochs=2.0
    ).orderBy("source")


def q_mixture_materialize(spark, sf_dir):
    """Deterministic materialization of the token mixture plan: each doc
    appears floor(rate) full epochs plus one fractional epoch decided by
    the engine-portable md5 bucket of (doc_id, epoch) — rerun-stable, no
    RNG. Budget 20000 / max 3 epochs so upsampling (epoch > 0) is
    exercised."""
    from spider_spark.operators import curation

    d = _docs_with_tokens(spark, sf_dir)
    plan = curation.token_budget_mixture(
        d, _MIXTURE_WEIGHTS, budget_tokens=20000, max_epochs=3.0
    )
    out = curation.materialize_mixture(d, plan)
    return out.select("doc_id", "source", "epoch").orderBy("doc_id", "epoch")


def q_semdedup(spark, sf_dir):
    """SemDeDup (embedding-cluster semantic dedup): corpus vectors plus 8
    planted near-identical copies (same perturbation scheme as
    embedding_near_dups_exact), clustered to the 16 smallest-id centroids;
    inside each cluster every vector with a smaller-id neighbor at
    cosine ≥ 0.9 is dropped (keep-min-id policy)."""
    from spider_spark.operators.similarity import semdedup

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 1000)
    planted = base.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.expr(
            "transform(embedding, (v, i) -> CAST(v AS FLOAT)"
            " + CASE WHEN i = 0 THEN CAST(0.01 AS FLOAT) ELSE CAST(0.0 AS FLOAT) END)"
        ).alias("embedding"),
    )
    allv = base.unionByName(planted)
    out = semdedup(allv, n_centroids=16, threshold=0.9)
    return out.select(
        "vec_id",
        "cent_id",
        "keep",
        "dup_of",
        F.round("max_dup_cos", 4).alias("max_dup_cos_r"),
    ).orderBy("vec_id")


def q_prototype_prune(spark, sf_dir):
    """Prototype-based data pruning (Sorscher et al. 2022): difficulty =
    cosine to the assigned cluster prototype; keep the hardest 50% of each
    cluster (per-cluster quota, so no cluster is emptied). Assignment is
    the same map-only smallest-id-codebook scheme as semdedup/ivf, and the
    window rank is restated in SQL by the oracle."""
    from spider_spark.operators.similarity import prototype_pruning

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 1000)
    out = prototype_pruning(base, n_centroids=16, keep_fraction=0.5, policy="hard")
    return out.select(
        "vec_id",
        "cent_id",
        F.round("proto_cos", 4).alias("proto_cos_r"),
        "cluster_size",
        "rank_in_cluster",
        "keep",
    ).orderBy("vec_id")


def q_layout_locality(spark, sf_dir):
    """Table-layout scan-locality audit: the same pages assigned to files
    under insertion (crawl) order vs SURT-clustered order, reporting
    hosts-per-file and files-per-host — the numbers that decide whether a
    host-scoped read (politeness, revalidation, reputation) is O(host) or
    O(table). Exact writer simulation (global row_number) here for oracle
    parity; the repartitionByRange scale path is pytest-pinned to the
    same statistics."""
    from spider_spark.operators import layout

    docs = _t(spark, sf_dir, "documents")
    hostn = F.pmod(F.col("doc_id"), F.lit(40)).cast("string")
    pages = docs.select(
        F.concat(
            F.lit("https://h"), hostn, F.lit(".test/p/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.concat(F.lit("h"), hostn, F.lit(".test")).alias("host"),
        F.col("doc_id").alias("seq"),
    )
    return layout.layout_compare(pages, rows_per_file=50).orderBy("layout")


def q_ip_politeness(spark, sf_dir):
    """Per-IP politeness (Heritrix ip-queue discipline): 40 vhosts resolve
    onto 8 IPs (md5 engine-portable buckets rendered as dotted quads), and
    each IP keeps at most 5 frontier rows per tick under the deterministic
    (priority, discovered_tick, seq) order — the cap that protects a
    shared server from per-host-only politeness. Two-phase salted window
    inside; the oracle restates the exact top-k as ONE window because the
    split is exact."""
    from spider_spark.operators import adaptive

    docs = _t(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("h"), F.pmod(F.col("doc_id"), F.lit(40)).cast("string"), F.lit(".test")
    )
    frontier = docs.select(
        F.concat(
            F.lit("https://"), host, F.lit("/p"), F.col("doc_id").cast("string")
        ).alias("url"),
        host.alias("host"),
        F.pmod(F.col("doc_id"), F.lit(5)).cast("int").alias("priority"),
        F.lit(0).alias("discovered_tick"),
        F.col("doc_id").alias("seq"),
    )
    host_ip = (
        frontier.select("host")
        .distinct()
        .select("host", adaptive.col_ip_bucket("host", n_ips=8).alias("ip"))
    )
    out = adaptive.ip_politeness_topk(frontier, host_ip, per_ip_budget=5)
    return out.select("url", "host", "ip", "is_ip_selected").orderBy("url")


def q_retrieval_eval(spark, sf_dir):
    """Retrieval-quality evaluation (TREC discipline) for the search
    stack: per-query precision@10 / recall@10 / RR@10 / nDCG@10 with the
    exponential gain, over analytically-synthesized ranked lists and
    graded qrels (results and judgments are independent deterministic
    functions of (query, doc), so every metric branch — misses, partial
    recall, graded gains — is exercised and the oracle restates the whole
    computation in SQL)."""
    from spider_spark.operators.index import retrieval_eval

    docs = _t(spark, sf_dir, "documents")
    qs = docs.filter(F.col("doc_id") < 10).select(F.col("doc_id").alias("query_id"))
    results = qs.select(
        "query_id", F.explode(F.sequence(F.lit(1), F.lit(10))).alias("rank")
    ).select(
        "query_id",
        F.pmod(F.col("query_id") * 17 + F.col("rank") * 13, F.lit(200)).alias(
            "doc_id"
        ),
        F.col("rank").cast("int").alias("rank"),
    )
    # qrels synthesized map-only: explode each candidate doc over the 10
    # query ids and keep the arithmetic matches — same rows the former
    # qs×ds theta-join produced, with no NL join in the plan
    qrels = (
        docs.filter(F.col("doc_id") < 200)
        .select(
            F.col("doc_id").alias("d"),
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("query_id"),
        )
        .filter(F.pmod(F.col("d") * 7 + F.col("query_id") * 3, F.lit(9)) == 0)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("d").alias("doc_id"),
            (F.lit(1) + F.pmod(F.col("d"), F.lit(3))).cast("int").alias("rel"),
        )
    )
    per_q = retrieval_eval(results, qrels, k=10)
    return per_q.select(
        "query_id",
        "n_retrieved",
        "n_rel",
        "n_rel_ret",
        F.round("precision_at_k", 4).alias("precision_r"),
        F.round("recall_at_k", 4).alias("recall_r"),
        F.round("rr_at_k", 4).alias("rr_r"),
        F.round("ndcg_at_k", 4).alias("ndcg_r"),
    ).orderBy("query_id")


def q_anchor_text(spark, sf_dir):
    """Per-target anchor-text rollup (the off-page relevance signal a
    focused crawler prioritizes on): inlink/source counts, distinct anchor
    variants, and the modal normalized anchor per destination URL, over a
    deterministic synthetic link table (3 outlinks per document)."""
    from spider_spark.operators.graph import anchor_text_aggregate

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    e = docs.select(
        "doc_id", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("i")
    )
    dst_id = (F.col("doc_id") * 7 + F.col("i") * 13) % 200
    anchor = (
        F.when((F.col("doc_id") + F.col("i")) % 10 == 0, F.lit(""))
        .when(
            (F.col("doc_id") + F.col("i")) % 3 == 0,
            F.concat(F.lit("Page "), (dst_id % 7).cast("string")),
        )
        .otherwise(F.concat(F.lit("topic-"), (dst_id % 5).cast("string")))
    )
    links = e.select(
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".test/p"),
            F.col("doc_id").cast("string"),
        ).alias("src"),
        F.concat(
            F.lit("https://h"),
            (dst_id % 20).cast("string"),
            F.lit(".test/p"),
            dst_id.cast("string"),
        ).alias("dst"),
        anchor.alias("anchor"),
    )
    return anchor_text_aggregate(links).orderBy("url")


def q_priority_aging(spark, sf_dir):
    """Anti-starvation politeness: the REAL politeness_tag two-phase salted
    top-k over a deterministic synthetic frontier, with priority aging on
    (effective priority = max(0, priority − rate·wait_ticks)). Selection is
    salt-invariant (phase 1 provably passes every global top-k row), so the
    oracle restates it as one exact rank per host."""
    from spider_spark.frontier import politeness_tag

    d = F.col("doc_id")
    frontier = _t(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://h"), (d % 10).cast("string"),
            F.lit(".test/p"), d.cast("string"),
        ).alias("url_canon"),
        F.xxhash64(F.col("doc_id")).alias("url_hash"),  # feeds only the salt
        F.concat(F.lit("h"), (d % 10).cast("string"), F.lit(".test")).alias("host"),
        F.when(d % 3 == 0, 100).when(d % 3 == 1, 150).otherwise(200)
        .cast("int").alias("priority"),
        (d % 6).cast("int").alias("discovered_tick"),
        F.lpad(d.cast("string"), 12, "0").alias("seq"),
    )
    cfg = CrawlConfig(
        per_host_budget=5, respect_robots=False, priority_aging_per_tick=10
    )
    tagged = politeness_tag(frontier, cfg, None, tick=20)
    return tagged.select("url_canon", "host", "is_selected").orderBy("url_canon")


def q_adaptive_budgets(spark, sf_dir):
    """Adaptive per-host politeness (AIMD): replay a deterministic
    synthetic results ledger per host in tick order — halve the budget on
    error ticks (>20% status≥500), grow by 1 (capped at base 8) on healthy
    ticks, ignore robots-blocked 451 rows. The oracle restates the fold
    with DuckDB's list_reduce; all-integer arithmetic keeps the two
    engines bit-identical."""
    from spider_spark.operators import adaptive

    d = F.col("doc_id")
    ledger = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), (d % 21).cast("string")).alias("host"),
        (d % 5).cast("int").alias("tick"),
        F.when(d % 11 == 0, 451).when(d % 13 == 0, 599).otherwise(200)
        .cast("int").alias("status"),
    )
    return adaptive.adaptive_host_budgets(ledger, base_budget=8).orderBy("host")


def q_quality_classifier(spark, sf_dir):
    """Hashed linear quality classifier (the CCNet/GPT-3 'looks like the
    reference corpus' filter): closed-form naive-Bayes log-odds weights
    trained on lang='en' vs rest in ONE aggregation pass, then applied as
    a gated-broadcast join + per-doc mean. Oracle restates both the
    training census and the scoring with the same md5 bucket arithmetic."""
    from spider_spark.operators import selection

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    pos = docs.filter(F.col("lang") == "en")
    neg = docs.filter(F.col("lang") != "en")
    w = selection.train_token_weights(pos, neg, n_buckets=4096)
    out = selection.linear_quality_score(docs, w, n_buckets=4096)
    return out.select(
        "id", "n_tokens",
        F.round("raw_score", 4).alias("raw_r"),
        F.round("prob", 4).alias("prob_r"),
    ).orderBy("id")


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    distributions of target (lang='zh') vs the raw corpus, add-1 smoothed;
    per-doc log weight = Σ log p̂/q̂ over the doc's feature stream."""
    from spider_spark.operators import selection

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    target = docs.filter(F.col("lang") == "zh")
    out = selection.dsir_log_weights(docs, target, n_buckets=4096)
    return out.select(
        "id", "n_feats", F.round("log_weight", 3).alias("log_weight_r")
    ).orderBy("id")


def q_trap_guard(spark, sf_dir):
    """Spider-trap guard over a deterministic synthetic frontier batch:
    calendar families collapse to one url_pattern (digit runs → N) and cap
    at 10 URLs per pattern; structural reasons (depth/params/repeated
    segment) are map-only first-match-wins. All pure Catalyst."""
    from spider_spark.operators import traps

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://h"),
        (d % 5).cast("string"),
        F.lit(".test"),
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("/cal/"),
                (d % 30 + 2000).cast("string"),
                F.lit("/"),
                (d % 12 + 1).cast("string"),
                F.lit("/"),
                (d % 28 + 1).cast("string"),
            ),
        )
        .when(d % 4 == 1, F.concat(F.lit("/a/b/a/b/a/b/p"), d.cast("string")))
        .when(
            d % 4 == 2,
            F.concat(
                F.lit("/search?k0=1&k1=1&k2=1&k3=1&k4=1&k5=1&k6=1&k7=1&k8=1&k9="),
                d.cast("string"),
            ),
        )
        .otherwise(F.concat(F.lit("/doc/"), d.cast("string"))),
    )
    batch = docs.select(
        "doc_id",
        url.alias("url_canon"),
        F.lpad(d.cast("string"), 8, "0").alias("seq"),
    )
    tagged = traps.trap_tag(batch, max_per_pattern=10)
    return tagged.select("doc_id", "url_pattern", "trap_reason").orderBy("doc_id")


def q_dup_clusters(spark, sf_dir):
    """Near-dup pairs → duplicate CLUSTERS via min-label-propagation
    connected components (the step after minhash/simhash pair generation:
    keep one doc per component). Deterministic synthetic pair graph over
    doc ids; oracle = recursive reachability closure in DuckDB."""
    from spider_spark.operators import graph as graph_ops

    docs = _t(spark, sf_dir, "documents")
    edges = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % 101).alias("dst"),
    )
    return graph_ops.connected_components(edges).orderBy("node")


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 appendix-C / Gopher-style n-gram
    overlap): documents sharing any word 3-gram with a small 'benchmark'
    set (docs 0-9), with matched-gram counts. Benchmark grams broadcast;
    only matching (id, gram) rows reach the aggregation."""
    from spider_spark.operators import curation

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10)
    grams = curation.benchmark_ngrams(bench, n=3)
    return curation.decontaminate(corpus, grams, n=3).orderBy("doc_id")


def q_split_assign(spark, sf_dir):
    """Deterministic train/val/test split assignment from an engine-
    portable md5 hash bucket (seed-free, stable across recomputation and
    cluster size — the property a training split actually needs)."""
    from spider_spark.operators import curation

    docs = _t(spark, sf_dir, "documents")
    return curation.assign_splits(docs).select("doc_id", "lang", "bucket", "split")


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language stratified subsample (en 50%, de 20%,
    zh 10%, others dropped) via the same portable hash bucket — a pure
    map-side filter at any scale."""
    from spider_spark.operators import curation

    docs = _t(spark, sf_dir, "documents")
    out = curation.stratified_hash_sample(docs, "lang", {"en": 50, "de": 20, "zh": 10})
    return out.select("doc_id", "lang")


def q_source_quota(spark, sf_dir):
    """Per-source quota curation: cap each source at its 5 'best' docs
    (longest, id tiebreak) via the two-phase salted top-k window — the
    politeness-window skew discipline applied to corpus mixing."""
    from spider_spark.operators import curation

    docs = _t(spark, sf_dir, "documents")
    out = curation.per_source_quota(
        docs, k=5, order_by=[F.col("n_chars").desc(), F.col("doc_id").asc()]
    )
    return out.select("source", "doc_id", "quota_rank")


def q_change_rate(spark, sf_dir):
    """Adaptive recrawl scheduling: Cho & Garcia-Molina change-rate
    estimator over a capture log (events ≙ captures: user_id ≙ url,
    event_type ≙ content fingerprint), plus the clamped refresh interval.
    One url-keyed window + one reusable groupBy — a single pass over the
    capture history at any scale."""
    from spider_spark.operators import recrawl

    ev = _t(spark, sf_dir, "events")
    rates = recrawl.change_rate(
        ev, url_col="user_id", ts_col="ts", fp_col="event_type", tiebreak_col="event_id"
    )
    out = recrawl.recrawl_intervals(rates, min_interval_s=600, max_interval_s=864000)
    return out.select(
        "user_id",
        "n_captures",
        "n_changes",
        F.round(F.col("lambda_per_s") * 86400, 6).alias("lambda_per_day_r"),
        F.round("interval_s", 2).alias("interval_s_r"),
    )


def q_content_seen(spark, sf_dir):
    """Mercator content-seen audit (dedup.content_seen_report): documents
    ≙ a capture ledger with planted duplicate content (doc_id mod 97 ≙
    fingerprint) — every capture judged first-vs-duplicate with the first
    encounter attributed. groupBy-min on the fp + one fp-keyed join; the
    online form is CrawlConfig(content_seen_dedup=True)."""
    from spider_spark.operators import dedup

    docs = _t(spark, sf_dir, "documents")
    caps = docs.select(
        F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url_canon"),
        F.format_string("%012d", F.col("doc_id")).alias("seq"),
        F.concat(F.lit("fp"), (F.col("doc_id") % 97).cast("string")).alias(
            "content_fp"
        ),
    )
    return dedup.content_seen_report(caps)


def q_retry_backoff(spark, sf_dir):
    """Transient-failure retry scheduling (recrawl.retry_backoff_plan,
    the Nutch/Heritrix backoff discipline): events ≙ a capture ledger
    (user ≙ url, day-index ≙ tick, event ordinal ≙ seq, a deterministic
    md5 coin ≙ transient-vs-ok status). One url-keyed window + a reusable
    groupBy — a single shuffle over the ledger at any scale."""
    from spider_spark.operators import recrawl

    ev = _t(spark, sf_dir, "events")
    coin = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    caps = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("url_canon"),
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "tick"
        ),
        F.format_string("%012d", F.col("event_id")).alias("seq"),
        F.when(coin < 30, F.lit(599)).otherwise(F.lit(200)).alias("status"),
    )
    return recrawl.retry_backoff_plan(
        caps, max_retries=3, base_delay_ticks=1, max_delay_ticks=64
    )


def q_http_freshness(spark, sf_dir):
    """RFC 9111 server-declared freshness lifetime per response
    (recrawl.http_freshness): Cache-Control no-store/no-cache → 0,
    s-maxage ≻ max-age, Expires−Date, 10% heuristic with cap — the
    precedence chain exercised branch-by-branch over analytically-built
    headers so the oracle is pure arithmetic (IMF-fixdate strings built
    and parsed with the same tz cancel exactly)."""
    from spider_spark.operators import recrawl

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    b = d % 6
    httpdate = lambda ts: F.date_format(ts, "EEE, dd MMM yyyy HH:mm:ss 'GMT'")  # noqa: E731
    epoch = F.timestamp_seconds(F.lit(1000000))
    resp = docs.select(
        F.concat(F.lit("https://h"), d % 7, F.lit(".test/p/"), d).alias("url"),
        F.when(b == 0, F.concat(F.lit("public, max-age="), d * 10))
        .when(b == 1, F.concat(F.lit("max-age=60, s-maxage="), d + 5))
        .when(b == 2, F.lit("no-cache"))
        .alias("cache_control"),
        F.when(b == 3, httpdate(F.timestamp_seconds(F.lit(1000000) + d * 100))).alias(
            "expires"
        ),
        F.when(b.isin(3, 4), httpdate(epoch)).alias("http_date"),
        F.when(b == 4, httpdate(F.timestamp_seconds(F.lit(1000000) - d * 1000))).alias(
            "last_modified"
        ),
    )
    return recrawl.http_freshness(resp).select("url", "freshness_s", "freshness_source")


def q_pagerank(spark, sf_dir):
    """Fixed-2-iteration PageRank over a deterministic link graph — the
    frontier-prioritization signal (OPIC/PageRank-ordered crawling).
    Iterations are unrolled identically in the DuckDB oracle."""
    from spider_spark.operators import graph as graph_ops

    docs = _t(spark, sf_dir, "documents")
    e1 = docs.select(
        F.col("doc_id").alias("src"), ((F.col("doc_id") * 13 + 7) % 200).alias("dst")
    )
    e2 = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("src"), ((F.col("doc_id") * 29 + 1) % 200).alias("dst")
    )
    ranks = graph_ops.pagerank(e1.unionByName(e2), iters=2)
    # +1e-12 pre-round bias (mirrored in the oracle): damped-rank values
    # are terminating decimals (0.15/N + 0.85^k/(N·2^m) families) that
    # land EXACTLY on x.5e-6 rounding boundaries, where summation-order
    # ulp noise flips the 6-decimal rounding between engines/partitionings
    # (observed on trustrank at sf0.1). The bias (≫ ulp, ≪ the 5e-7
    # boundary step) pushes exact halves deterministically up on both
    # sides — the same stabilize-before-round discipline as the r4 OLS
    # degeneracy guard.
    return ranks.select(
        "node", F.round(F.col("rank") + F.lit(1e-12), 6).alias("rank_r")
    ).orderBy("node")


def _md5_random_edges(docs, n_nodes: int = 60):
    """Deterministic pseudo-random directed edge list over an n_nodes
    universe, endpoints drawn from md5(doc_id) nibbles — dense enough to
    close triangles (affine-map edges never do), identical in DuckDB."""
    h = F.md5(F.col("doc_id").cast("string"))

    def part(pos):
        return F.conv(F.substring(h, pos, 8), 16, 10).cast("long") % n_nodes

    e1 = docs.select(part(1).alias("src"), part(9).alias("dst"))
    e2 = docs.filter(F.col("doc_id") % 2 == 0).select(
        part(17).alias("src"), part(25).alias("dst")
    )
    return e1.unionByName(e2)


_MD5_EDGES_SQL = """
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              % 60 AS BIGINT) AS src,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::UBIGINT
              % 60 AS BIGINT) AS dst
  FROM documents
  UNION ALL
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 8))::UBIGINT
              % 60 AS BIGINT),
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8))::UBIGINT
              % 60 AS BIGINT)
  FROM documents WHERE doc_id % 2 = 0
"""


def q_triangle_stats(spark, sf_dir):
    """Exact per-node triangle counts + local clustering coefficient
    (graph.triangle_stats, the Suri-Vassilvitskii degree-oriented wedge
    algorithm) over a deterministic md5-random link graph — the
    link-farm/community-density diagnostic. The oracle restates the
    triangle enumeration as an a<b<c triple join."""
    from spider_spark.operators import graph as graph_ops

    docs = _t(spark, sf_dir, "documents")
    return graph_ops.triangle_stats(_md5_random_edges(docs))


def q_harmonic_2hop(spark, sf_dir):
    """Exact truncated harmonic centrality at radius 2 over incoming
    edges (graph.harmonic_centrality_2hop): n1 + n2/2 per node. The
    exact small-radius member of the neighborhood-function family whose
    any-radius scale path is graph.hyperball."""
    from spider_spark.operators import graph as graph_ops

    docs = _t(spark, sf_dir, "documents")
    return graph_ops.harmonic_centrality_2hop(_md5_random_edges(docs))


def q_hyperball(spark, sf_dir):
    """HyperBall (Boldi & Vigna 2013) neighborhood function + truncated
    harmonic centrality via per-node HLL counters, radius 3, m=64
    registers kept EXPLODED so each sweep is one |E| join + one
    partial-agg max (no per-reducer hub blowup). Approximate by design →
    rows-only here; tests/test_graph_centrality.py gates the estimates
    against exact BFS balls (4-sigma per node, 12% mean), and
    harmonic_centrality_2hop is the exact oracle-backed sibling."""
    from spider_spark.operators import graph as graph_ops

    docs = _t(spark, sf_dir, "documents")
    return graph_ops.hyperball(_md5_random_edges(docs), radius=3, log2m=6)


def q_session_stats(spark, sf_dir):
    """Gap-based sessionization (operators/sessions.session_stats, 30-min
    web-session timeout): one user-keyed window (lag → break → running
    sum) + a groupBy whose key extends the window key — a single shuffle
    end-to-end (asserted via explain in tests). Gap arithmetic runs on
    second-truncated epochs in both engines (Spark ts→long truncates;
    the oracle floors epoch())."""
    from spider_spark.operators import sessions

    ev = _t(spark, sf_dir, "events")
    return sessions.session_stats(ev.select("user_id", "ts"), gap_s=1800)


def q_sitemap_write(spark, sf_dir):
    """Sitemap write side (sitemap.build_urlsets): per-host <urlset>
    bodies from a URL inventory, XML entities escaped with the exact
    inverse of the reader. Hosts stay under the 50k cap here so shard is
    0 and the FULL XML string is oracle-compared (string_agg ORDER BY
    restates sort_array+array_join); the hash sharding above the cap is
    pytest-gated (xxhash64 has no DuckDB twin)."""
    from spider_spark import sitemap as sitemap_ops

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example/p"),
            F.col("doc_id").cast("string"),
            F.lit("?a=1&q=<"),
            F.col("lang"),
            F.lit(">"),
        ).alias("url_canon"),
        F.concat(
            F.lit("h"), (F.col("doc_id") % 7).cast("string"), F.lit(".example")
        ).alias("host"),
        F.date_format(
            F.date_add(F.lit("2026-01-01").cast("date"), (F.col("doc_id") % 28).cast("int")),
            "yyyy-MM-dd",
        ).alias("mod"),
    )
    return sitemap_ops.build_urlsets(pages, lastmod_col="mod")


def q_lpa_communities(spark, sf_dir):
    """Synchronous 2-sweep label propagation (graph.lpa_communities,
    deterministic min-label tie-break) — the cheap community/link-farm
    first look. The oracle unrolls both sweeps as vote censuses +
    row_number picks, exactly like the pagerank_2iter discipline."""
    from spider_spark.operators import graph as graph_ops

    docs = _t(spark, sf_dir, "documents")
    return graph_ops.lpa_communities(_md5_random_edges(docs), sweeps=2)


def q_phrase_search(spark, sf_dir):
    """Exact phrase query over the positional index (index.phrase_search):
    postings filtered to the phrase's terms (IN-list pushed into the
    scan), each term anchored at pos−i, k−1 equi-joins on (doc, anchor).
    The oracle restates posexplode via generate_series + list indexing."""
    from spider_spark.operators import index as index_ops

    docs = _t(spark, sf_dir, "documents")
    return index_ops.phrase_search(docs, "table part")


def q_query_snippets(spark, sf_dir):
    """Query-biased snippets (index.query_snippets, Manning/IIR §8.7):
    per matching doc, the 8-token window starting at a query-term hit
    that covers the most distinct query terms (earliest start on ties),
    reconstructed from the positional index. The oracle restates the
    candidate/coverage band join and string_agg-by-pos in DuckDB."""
    from spider_spark.operators import index as index_ops

    from pyspark.sql import functions as F

    docs = _t(spark, sf_dir, "documents")
    snips = index_ops.query_snippets(docs, "table part", window=8)
    # posexplode's pos is INT; the oracle's range() ordinal is BIGINT
    return snips.withColumn("start", F.col("start").cast("long"))


def q_zipf_fit(spark, sf_dir):
    """Zipf rank-frequency OLS over the top-30 vocabulary
    (textqc.zipf_fit): ranking via TakeOrdered + a <=k-row window, one
    closed-form regression row. The oracle restates the ln-ln OLS."""
    from spider_spark.operators import textqc

    docs = _t(spark, sf_dir, "documents")
    return textqc.zipf_fit(docs, k=30)


def q_dhash_near_dups(spark, sf_dir):
    """Perceptual-hash image near-dup (phash.dhash_near_dups): 18×16
    grayscale images synthesized arithmetically — pixel(p) = (p·s + k)
    mod 256 with content key k = doc_id DIV 2 (every even/odd pair is an
    exact perceptual dup) and gradient step s = k%13+1. max_dist=4 is
    the pigeonhole-complete band regime. The default hot-band guard
    (max_band_size=2000) is LIVE here and the oracle replicates its
    census + anti-join semantics: at sf0.01 no bucket crosses the cap
    (result == brute-force all-pairs), at sf0.1 the near-uniform val=0
    buckets (~2.8k members) are dropped on both sides identically."""
    from spider_spark.operators import phash

    docs = _t(spark, sf_dir, "documents")
    k = F.expr("doc_id DIV 2")
    s = F.pmod(k, F.lit(13)) + 1
    imgs = docs.select(
        F.col("doc_id").alias("img_id"),
        F.lit(18).alias("width"),
        F.lit(16).alias("height"),
        F.transform(
            F.sequence(F.lit(0), F.lit(287)),
            lambda p: F.pmod(p * s + k, F.lit(256)),
        ).alias("pixels"),
    )
    return phash.dhash_near_dups(imgs, max_dist=4)


def q_dhash_hot_band_census(spark, sf_dir):
    """No-silent-caps accounting for the dhash hot-band guard
    (phash.dhash_hot_band_census): same synthetic image family as
    dhash_near_dups, cap 100 so the census is non-trivial at sf0.01 —
    reports (band, hot_buckets, dropped_memberships) per band position.
    The oracle restates the banding + census in SQL."""
    from spider_spark.operators import phash

    docs = _t(spark, sf_dir, "documents")
    k = F.expr("doc_id DIV 2")
    s = F.pmod(k, F.lit(13)) + 1
    imgs = docs.select(
        F.col("doc_id").alias("img_id"),
        F.lit(18).alias("width"),
        F.lit(16).alias("height"),
        F.transform(
            F.sequence(F.lit(0), F.lit(287)),
            lambda p: F.pmod(p * s + k, F.lit(256)),
        ).alias("pixels"),
    )
    return phash.dhash_hot_band_census(imgs, max_band_size=100)


def q_collocations_pmi(spark, sf_dir):
    """Adjacent-bigram PMI collocations (textqc.collocations_pmi,
    Church & Hanks 1990), min_count=5. The oracle restates the bigram
    zip, both censuses, and the PMI formula."""
    from spider_spark.operators import textqc

    docs = _t(spark, sf_dir, "documents")
    return textqc.collocations_pmi(docs, min_count=5)


def q_readability_flesch(spark, sf_dir):
    """Flesch Reading Ease (textqc.readability_scores): vowel-group
    syllable heuristic, terminator-run sentence count, FRE rounded to 6.
    The oracle restates all three regex censuses with list_transform."""
    from spider_spark.operators import textqc

    docs = _t(spark, sf_dir, "documents")
    return textqc.readability_scores(docs)


def q_politeness_compliance(spark, sf_dir):
    """Rate-limit compliance audit (adaptive.politeness_compliance):
    events bucketed to 8 pseudo-hosts, per-host lag gaps in epoch ms vs
    a VALUES delay table (h0..h7 declare (i%4+1)*500 ms). UTC-pinned.
    The oracle restates the lag census with epoch_ms."""
    from spider_spark.operators import adaptive as ad

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events")
    fetches = ev.select(
        F.concat(
            F.lit("h"), F.pmod(F.col("user_id"), F.lit(8)).cast("string")
        ).alias("host"),
        F.col("ts"),
    )
    delays = spark.createDataFrame(
        [(f"h{i}", (i % 4 + 1) * 500) for i in range(8)],
        "host string, crawl_delay_ms int",
    )
    return ad.politeness_compliance(fetches, delays)


def q_hreflang_reciprocity(spark, sf_dir):
    """hreflang audit (metarobots.hreflang_reciprocity): synthesize
    per-doc link tags arithmetically — every doc declares its pair
    partner (reciprocal by construction), every d%5==0 doc also declares
    a dangling alternate (never reciprocated). Extraction regexes +
    the edge-reversal join are all differential vs the arithmetic."""
    from spider_spark import metarobots as mr

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    partner = F.when(F.pmod(d, F.lit(2)) == 0, d + 1).otherwise(d - 1)
    html = F.concat(
        F.lit('<link rel="alternate" hreflang="en" href="u'),
        partner.cast("string"),
        F.lit('">'),
        F.when(
            F.pmod(d, F.lit(5)) == 0,
            F.concat(
                F.lit('<link rel="alternate" hreflang="fr" href="x'),
                d.cast("string"),
                F.lit('">'),
            ),
        ).otherwise(F.lit("")),
    )
    pages = docs.select(
        F.concat(F.lit("u"), d.cast("string")).alias("url"), html.alias("html")
    )
    return mr.hreflang_reciprocity(pages)


def q_quantize_embeddings_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization
    (similarity.quantize_embeddings_int8): scale = max|x|/127, q =
    clamp(floor(x/scale + 0.5), ±127) — the round-half-up spelling both
    engines compute identically in double. qvec is emitted
    comma-joined so the value compare is representation-stable."""
    from spider_spark.operators import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    qz = sim.quantize_embeddings_int8(emb)
    return qz.select(
        "vec_id",
        "dim",
        "scale_r",
        F.array_join(
            F.transform("qvec", lambda v: v.cast("string")), ","
        ).alias("qvec_s"),
        "max_abs_err_r",
    )


def q_percolate_alerts(spark, sf_dir):
    """Prospective search (index.percolate): 5 standing conjunctive
    queries matched against the documents batch — distinct-term set
    semantics both sides, term-keyed join (query legs broadcast-sized),
    conjunction = one partial-agg census equality. The oracle restates
    the match with a VALUES query registry."""
    from spider_spark.operators import index as index_ops

    docs = _t(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(
        [
            (0, "table part"),
            (1, "fast scan"),
            (2, "merge"),
            (3, "big data"),
            (4, "slow join"),
        ],
        "query_id long, query string",
    )
    return index_ops.percolate(docs, qdf)


def q_trending_event_types(spark, sf_dir):
    """Windowed trend detection (operators/trends.trending_terms):
    tumbling 60-min counts per event_type + adjacent-window lift (lift
    null across gaps/cold starts — a term absent from the immediately
    preceding window restarts). UTC-pinned like events_hourly_rollup.
    Streaming twin: streaming.stream_trending_terms (same counts
    semantics, asserted in tests/test_trends.py)."""
    from spider_spark.operators import trends

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events")
    return trends.trending_terms(
        ev, ts_col="ts", window_minutes=60, term_col="event_type"
    )


def q_sitemap_coverage(spark, sf_dir):
    """Per-host sitemap coverage audit (sitemap.sitemap_coverage): one
    full-outer join of deduped crawled-URL and sitemap-loc sides, then a
    per-host census {n_both, n_crawled_only, n_listed_only} + coverage
    ratio. Sides synthesized arithmetically: crawled = d%3!=0, listed =
    d%2==0, host = d%16."""
    from spider_spark import sitemap as sm

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = F.concat(F.lit("h"), F.pmod(d, F.lit(16)).cast("string"))
    u = F.concat(F.lit("u"), d.cast("string"))
    crawled = docs.where(F.pmod(d, F.lit(3)) != 0).select(
        host.alias("host"), u.alias("url_canon")
    )
    locs = docs.where(F.pmod(d, F.lit(2)) == 0).select(
        host.alias("host"), u.alias("loc")
    )
    return sm.sitemap_coverage(crawled, locs)


def q_host_url_space_estimate(spark, sf_dir):
    """Chapman capture-recapture host-size estimation
    (sitemap.host_url_space_estimate; Chapman 1951, the Lawrence &
    Giles overlap method): sitemap listing and crawl as two samples of
    each host's page population, N-hat from the overlap,
    undiscovered_est = the pages neither sample surfaced. Same
    arithmetic sides as sitemap_coverage, so the join and census are
    shared machinery; the estimator is a map-only projection."""
    from spider_spark import sitemap as sm

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = F.concat(F.lit("h"), F.pmod(d, F.lit(16)).cast("string"))
    u = F.concat(F.lit("u"), d.cast("string"))
    crawled = docs.where(F.pmod(d, F.lit(3)) != 0).select(
        host.alias("host"), u.alias("url_canon")
    )
    locs = docs.where(F.pmod(d, F.lit(2)) == 0).select(
        host.alias("host"), u.alias("loc")
    )
    return sm.host_url_space_estimate(crawled, locs)


def q_robots_policy_diff(spark, sf_dir):
    """robots.txt policy drift across a recrawl wave
    (robots.robots_policy_diff): synthesize per-host OLD and NEW robots
    bodies arithmetically from doc_id (disallow prefix keyed on d%3 vs
    d%5, probe path on d%7, crawl-delays d%4+1 vs d%4+2 seconds), parse
    both snapshots with the vectorized RFC 9309 parser, and diff the
    frontier verdicts. The oracle derives every expected column with
    modular arithmetic — parsing, longest-match evaluation, and the
    unavailable-robots=allow rule are all differential here."""
    from spider_spark import robots as rb

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = F.concat(F.lit("h"), d.cast("string"))
    old_b = docs.select(
        host.alias("host"),
        F.concat(
            F.lit("User-agent: *\nDisallow: /private/"),
            F.pmod(d, F.lit(3)).cast("string"),
            F.lit("/\nCrawl-delay: "),
            (F.pmod(d, F.lit(4)) + 1).cast("string"),
        ).alias("robots_txt"),
    )
    new_b = docs.select(
        host.alias("host"),
        F.concat(
            F.lit("User-agent: *\nDisallow: /private/"),
            F.pmod(d, F.lit(5)).cast("string"),
            F.lit("/\nCrawl-delay: "),
            (F.pmod(d, F.lit(4)) + 2).cast("string"),
        ).alias("robots_txt"),
    )
    probes = docs.select(
        host.alias("host"),
        F.concat(
            F.lit("/private/"), F.pmod(d, F.lit(7)).cast("string"), F.lit("/x")
        ).alias("path"),
    )
    return rb.robots_policy_diff(
        rb.rules_from_bodies(old_b), rb.rules_from_bodies(new_b), probes
    )


def q_postings_vbyte_stats(spark, sf_dir):
    """Gap+VByte index storage estimate (index.postings_compression_stats,
    IIR §5.3): per-term d-gap varint byte cost via the two-level bucketed
    gap computation (hot-term windows bounded by bucket width). The
    oracle restates the SEQUENTIAL definition with one lag window — the
    two levels must sum to exactly it."""
    from spider_spark.operators import index as index_ops

    docs = _t(spark, sf_dir, "documents")
    return index_ops.postings_compression_stats(docs, bucket_bits=4)


def q_elias_fano_stats(spark, sf_dir):
    """Elias–Fano index storage estimate (index.elias_fano_stats, Vigna
    WSDM'13): per-term quasi-succinct size from (df, max_id) alone — one
    partial-agg census, no windows, no gap sequence. floor(log2) via
    integer bit length (`col_floor_log2`) so power-of-two universes are
    exact on both engines; the oracle restates the formula with DuckDB's
    bin()/>>/'//'."""
    from spider_spark.operators import index as index_ops

    docs = _t(spark, sf_dir, "documents")
    return index_ops.elias_fano_stats(docs)


def q_char_entropy(spark, sf_dir):
    """Character-distribution entropy (textqc.char_entropy): the
    order-free gibberish signal beside compression_ratio — prose
    ~3.5-4.5 bits/char, base64 toward the ceiling, template filler
    toward 0. Pure Catalyst (distinct-char census within the row), so
    the oracle replays it with DuckDB list lambdas."""
    from spider_spark.operators import textqc

    return textqc.char_entropy(_t(spark, sf_dir, "documents"))


def q_cross_source_dups(spark, sf_dir):
    """Syndication census (dedup.cross_source_dup_matrix): per unordered
    source pair, byte-identical documents shared — the wire-copy map
    mixture planning reads next to the dedup rate. Spark joins on the
    md5 fingerprint census (text never shuffles); the oracle groups by
    the text itself — identical pairs required."""
    from spider_spark.operators.dedup import cross_source_dup_matrix

    docs = _t(spark, sf_dir, "documents")
    # plant syndication: every 4th doc carries one of 5 wire stories,
    # so identical content recurs across the source strata
    salted = docs.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("syndicated wire copy "),
                F.pmod(F.col("doc_id"), F.lit(5)).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return cross_source_dup_matrix(salted)


def q_credit_card_signals(spark, sf_dir):
    """Credit-card exposure signals (curation.credit_card_signals):
    unambiguous PAN candidate shapes + pure-Catalyst Luhn verification
    (ISO 7812) — the Dolma-class scrub beside email/IP/phone. PANs
    planted arithmetically (valid Visa test number, its Luhn-failing
    sibling, the grouped form); ground truth derived from the
    construction while Spark must match AND checksum the real strings."""
    from spider_spark.operators import curation as cu

    docs = _t(spark, sf_dir, "documents")
    v = F.pmod(F.col("doc_id"), F.lit(5))
    salted = docs.select(
        "doc_id",
        F.concat(
            F.coalesce("text", F.lit("")),
            F.when(v == 0, F.lit(" pay 4532015112830366 now"))
            .when(v == 1, F.lit(" pay 4532015112830367 now"))
            .when(v == 2, F.lit(" card 4532-0151-1283-0366 on file"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return cu.credit_card_signals(salted)


def q_pca_project(spark, sf_dir):
    """PCA embedding compaction (similarity.pca_fit/pca_project): fit
    the top-8 variance directions via ONE sufficient-statistics pass
    (per-batch partial moments, driver-side 64×64 eigh, sign-
    canonicalized basis), project every vector. Rows-only — a d×d
    eigendecomposition is not SQL-expressible; exact ground truth is
    the numpy differential in tests/test_pca.py (fit, projection, and
    partitioning invariance all pinned)."""
    from spider_spark.operators import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    model = sim.pca_fit(emb, k=8)
    return sim.pca_project(emb, model).orderBy("id")


def q_bowtie_classes(spark, sf_dir):
    """Bow-tie decomposition (graph.bowtie_classes, Broder WWW'00): the
    crawl census's macroscopic map — pivot's giant SCC, the IN set that
    reaches it, the OUT set it drains into, and the rest — via two BFS
    reachability runs over the shared deterministic link graph (depth
    ≤ 11 here, fixpoint-stopped). The oracle restates reachability as
    two WITH RECURSIVE closures plus the degree-argmax pivot."""
    from spider_spark.operators import graph

    return graph.bowtie_classes(
        _link_edges(_t(spark, sf_dir, "documents"))
    )


def q_amp_variant_pairs(spark, sf_dir):
    """AMP↔canonical pairing by URL convention (mirrors.
    amp_variant_pairs): every doc contributes a plain url; %3==0 docs
    add a /amp path variant, %3==1 docs an amp. subdomain variant —
    pairs derivable arithmetically while Spark must normalize the real
    urls through the host/path regexes."""
    from spider_spark.operators import mirrors

    docs = _t(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("https://s"),
        F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        F.lit(".example"),
    )
    plain = docs.select(
        F.concat(host, F.lit("/p"), F.col("doc_id").cast("string")).alias(
            "url"
        )
    )
    amp_path = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.concat(
            host, F.lit("/p"), F.col("doc_id").cast("string"), F.lit("/amp")
        ).alias("url")
    )
    amp_sub = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.concat(
            F.lit("https://amp.s"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example/p"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    pages = plain.unionByName(amp_path).unionByName(amp_sub)
    return mirrors.amp_variant_pairs(pages)


def q_title_consistency(spark, sf_dir):
    """Title-surface agreement (structured.title_consistency): <title>
    vs og:title vs first <h1> after normalize — template-rot QC and the
    canonical-display pick. Synthesized: og matches title on doc_id%3
    ==0 (case-folded), h1 diverges on %2==1, title entity-decoded.
    Construction-derived oracle; Spark parses the real tags."""
    from spider_spark.operators import structured as st

    docs = _t(spark, sf_dir, "documents")
    t12 = F.lower(F.substring(F.coalesce("text", F.lit("")), 1, 12))
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.concat(
            F.lit("<html><head><title>"),
            F.upper(t12),
            F.lit(" &amp; co</title>"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit('<meta property="og:title" content="'),
                    t12,
                    F.lit(' &amp; co">'),
                ),
            ).otherwise(F.lit("")),
            F.lit("</head><body><h1>"),
            F.when(F.col("doc_id") % 2 == 1, F.lit("different"))
            .otherwise(F.concat(t12, F.lit(" &amp; co"))),
            F.lit("</h1></body></html>"),
        ).alias("html"),
    )
    return st.title_consistency(pages)


def q_watermark_lateness(spark, sf_dir):
    """Watermark-tuning audit (streaming.watermark_lateness_audit):
    replay the event log in arrival order and count what a 10-minute
    watermark WOULD drop, per event-time hour — the report you read
    before setting the streaming twins' delay. Running max computed
    two-level (bucketed prefix scan, no single-task global window); the
    oracle restates the sequential single-window definition, which the
    levels must reproduce exactly."""
    from spider_spark.streaming import watermark_lateness_audit

    return watermark_lateness_audit(
        _t(spark, sf_dir, "events"),
        delay="10 minutes",
        window="1 hour",
    )


def q_compression_ratio(spark, sf_dir):
    """zlib compression-ratio QC signal (textqc.compression_ratio — the
    RefinedWeb/Dolma repetition-vs-gibberish band filter): repetitive
    spam compresses ≪ prose, byte soup ≈ 1. Rows-only — zlib is not
    SQL-expressible in DuckDB; exact ground truth is the byte-for-byte
    python-zlib differential in tests/test_corpus_qc.py (zlib at a
    fixed level is deterministic, so the check is exact, not
    statistical)."""
    from spider_spark.operators import textqc

    return textqc.compression_ratio(
        _t(spark, sf_dir, "documents")
    ).orderBy("id")


def q_ai_crawler_policy(spark, sf_dir):
    """Robots-side training-crawler census (robots.ai_crawler_policy):
    per (host, agent) root-allowed verdicts for GPTBot/ClaudeBot/
    Google-Extended/CCBot/Applebot-Extended under real RFC 9309 group
    selection — the robots.txt half of the ML opt-out story next to
    ai_optout_screen's in-page half. Bodies synthesized arithmetically
    (4 policy shapes incl. a specific-UA carveout beating a * disallow
    and a missing-robots host); the oracle derives verdicts from the
    construction while Spark must PARSE the real files."""
    from spider_spark import robots as rb

    docs = _t(spark, sf_dir, "documents")
    v = F.pmod(F.col("doc_id"), F.lit(4))
    body = (
        F.when(
            v == 0,
            F.lit(
                "User-agent: GPTBot\nDisallow: /\n\n"
                "User-agent: ClaudeBot\nDisallow: /\n\n"
                "User-agent: *\nDisallow: /private/\n"
            ),
        )
        .when(
            v == 1,
            F.lit(
                "User-agent: Google-Extended\nDisallow: /\n\n"
                "User-agent: *\nAllow: /\n"
            ),
        )
        .when(v == 2, F.lit(None).cast("string"))
        .otherwise(
            F.lit(
                "User-agent: CCBot\nAllow: /\n\nUser-agent: *\nDisallow: /\n"
            )
        )
    )
    bodies = docs.filter(F.col("doc_id") < 48).select(
        F.concat(F.lit("h"), F.col("doc_id").cast("string")).alias("host"),
        body.alias("robots_txt"),
    )
    return rb.ai_crawler_policy(bodies)


def q_rbp_err_eval(spark, sf_dir):
    """User-model retrieval metrics (index.rbp_err_eval): RBP@10 (Moffat
    & Zobel — persistence-p browsing, with the p^k residual error bar)
    and ERR@10 (Chapelle's cascade model) over the same synthesized
    runs/qrels as retrieval_eval_ndcg. Oracle restates the cascade
    survival product as EXP(SUM(LN)) over the preceding-rows frame."""
    from spider_spark.operators.index import rbp_err_eval

    docs = _t(spark, sf_dir, "documents")
    qs = docs.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("query_id")
    )
    results = qs.select(
        "query_id", F.explode(F.sequence(F.lit(1), F.lit(10))).alias("rank")
    ).select(
        "query_id",
        F.pmod(F.col("query_id") * 17 + F.col("rank") * 13, F.lit(200)).alias(
            "doc_id"
        ),
        F.col("rank").cast("int").alias("rank"),
    )
    qrels = (
        docs.filter(F.col("doc_id") < 200)
        .select(
            F.col("doc_id").alias("d"),
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("query_id"),
        )
        .filter(F.pmod(F.col("d") * 7 + F.col("query_id") * 3, F.lit(9)) == 0)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("d").alias("doc_id"),
            (F.lit(1) + F.pmod(F.col("d"), F.lit(3))).cast("int").alias("rel"),
        )
    )
    return rbp_err_eval(results, qrels, k=10, p=0.8, max_rel=3)


def q_pagination_chains(spark, sf_dir):
    """Pagination-chain assembly (metarobots.pagination_chains):
    rel=next pointers → connected-component chain ids + head/tail
    degree flags, so page 2..N of an article never enters the corpus as
    an independent document. Chains synthesized arithmetically (triples
    by doc_id div 3, zero-padded urls so string-min == numeric-min; the
    final partial chain exercises the dangling-pointer branch); the
    oracle derives chain structure from the construction while Spark
    must parse the tags and propagate labels."""
    from spider_spark import metarobots as mr

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("u"), F.lpad(F.col("doc_id").cast("string"), 6, "0")
    )
    nxt = F.concat(
        F.lit("u"), F.lpad((F.col("doc_id") + 1).cast("string"), 6, "0")
    )
    pages = docs.select(
        url.alias("url"),
        F.when(
            F.col("doc_id") % 3 < 2,
            F.concat(
                F.lit('<html><head><link rel="next" href="'),
                nxt,
                F.lit('"></head></html>'),
            ),
        )
        .otherwise(F.lit("<html><head></head></html>"))
        .alias("html"),
    )
    return mr.pagination_chains(pages)


def q_jsonld_entities(spark, sf_dir):
    """JSON-LD entity extraction (structured.jsonld_entities): script
    islands parsed with a corrupt-record column so broken JSON-LD
    (endemic on the real web — planted on every 4th doc) surfaces as
    valid=false rows, never job failures. Islands synthesized
    arithmetically; the oracle derives expected rows from the
    construction while Spark must extract + parse the real payloads."""
    from spider_spark.operators import structured as st

    docs = _t(spark, sf_dir, "documents")
    t20 = F.substring(F.coalesce("text", F.lit("")), 1, 20)
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit('<html><head><script type="application/ld+json">'),
            F.lit('{"@type": "Article", "headline": "'),
            t20,
            F.lit('"}</script>'),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit(
                    "<script type='application/ld+json'>{oops</script>"
                ),
            ).otherwise(F.lit("")),
            F.lit("</head><body>x</body></html>"),
        ).alias("html"),
    )
    return st.jsonld_entities(pages, id_col="doc_id")


def q_og_properties(spark, sf_dir):
    """OpenGraph card extraction (structured.og_properties): og:* meta
    tags in document order across the three quoting styles (planted:
    double-quoted title always, single-quoted type + unquoted image on
    every 3rd doc). Construction-derived oracle, Spark parses the real
    tags."""
    from spider_spark.operators import structured as st

    docs = _t(spark, sf_dir, "documents")
    t15 = F.substring(F.coalesce("text", F.lit("")), 1, 15)
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit('<html><head><meta property="og:title" content="'),
            t15,
            F.lit('">'),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(
                    "<meta property='og:type' content='article'>"
                    "<META PROPERTY=og:image CONTENT=https://x.example/i.png>"
                ),
            ).otherwise(F.lit("")),
            F.lit('<meta name="description" content="not og">'),
            F.lit("</head></html>"),
        ).alias("html"),
    )
    return st.og_properties(pages, id_col="doc_id")


def q_html_tables(spark, sf_dir):
    """HTML table extraction (structured.html_tables): tables synthesized
    arithmetically — every doc gets a 2-column table with a <th> header
    row and (doc_id % 3 + 1) body rows whose cells exercise nested-tag
    stripping (<b>v</b> → 'v ' + collapse) and the 5-entity chain
    (&amp; → &); every 4th doc adds a second single-cell table. The
    oracle derives the expected (id, table_idx, row_idx, cells, header)
    rows from the construction while Spark must genuinely parse."""
    from spider_spark.operators import structured as st

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def body_row(i):
        return F.when(
            d % 3 + 1 >= i,
            F.concat(
                F.lit("<tr><td><b>v</b>"),
                d.cast("string"),
                F.lit(f"_{i}</td><td>"),
                (d * 10 + i).cast("string"),
                F.lit(" &amp; up</td></tr>"),
            ),
        ).otherwise(F.lit(""))

    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><h1>x</h1>"),
            F.lit('<table id="t0"><tr><th>Name</th><th>Qty</th></tr>'),
            body_row(1),
            body_row(2),
            body_row(3),
            F.lit("</table>"),
            F.when(
                d % 4 == 0,
                F.lit("<table><tr><td>only</td></tr></table>"),
            ).otherwise(F.lit("")),
            F.lit("</body></html>"),
        ).alias("html"),
    )
    return st.html_tables(pages, id_col="doc_id")


def q_symspell_suggestions(spark, sf_dir):
    """Batch SymSpell spelling correction (index.symspell_suggestions,
    Garbe's symmetric-delete algorithm): a whole query table corrected
    in ONE job — candidate generation is an equi-join on precomputed
    delete variants, levenshtein only verifies the survivors. The
    oracle brute-forces the same answer with a full vocab × query cross
    join — the index structure must be invisible in the results."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [("spark",), ("sparkk",), ("windo",), ("tble",), ("zzz",)],
        "query_term string",
    )
    return idx.symspell_suggestions(docs, queries, n=3)


def q_parked_screen(spark, sf_dir):
    """Parked-domain screening (textqc.parked_domain_flags): parking
    phrases planted on every 6th doc as a TINY lander (certain), every
    6th+1 doc as a LONG article quoting the phrase (survives — both
    signals required). The oracle inlines the same PARKED_RE (ASCII
    alternation, (?i) + \\b — Java regex ≡ RE2, the SOFT404_RE
    discipline)."""
    from spider_spark.operators import textqc

    docs = _t(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 6 == 0,
            F.lit("This domain is for sale. Sponsored listings below."),
        )
        .when(
            F.col("doc_id") % 6 == 1,
            F.concat(
                F.lit("A long read about domain parking economics. "),
                F.col("text"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return textqc.parked_domain_flags(salted).select(
        "doc_id", "parked_phrase", "suspect_tiny", "parked"
    )


def q_temperature_mixture(spark, sf_dir):
    """Temperature-sampled mixture plan (curation.
    temperature_mixture_rates, the XLM-R/mT5 α-smoothing rule): per-
    source rates from w ∝ available^α derived in-plan — α=0.3 lifts
    tail sources without drowning the head. Oracle restates the census,
    POWER weights, scalar share, cap, and planned tokens."""
    from spider_spark.operators import curation as cu

    docs = _t(spark, sf_dir, "documents")
    return cu.temperature_mixture_rates(
        docs,
        alpha=0.3,
        budget_tokens=50_000,
        tokens_col="n_chars",
        max_epochs=2.0,
    )


def q_reshard_move_stats(spark, sf_dir):
    """Reshard movement measured (layout.reshard_move_stats): 3 shards →
    +1 under mod-N vs rendezvous routing. The consistent-hashing claim
    as numbers: HRW moves ≈ the new shard's fair share and ONLY onto the
    new shard; mod-N reshuffles most of the key space. Oracle replays
    both routings (md5 scores, ≥-cascade ties, mod buckets)."""
    from spider_spark.operators import layout

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return layout.reshard_move_stats(
        docs, ["s-a", "s-b", "s-c"], ["s-a", "s-b", "s-c", "s-d"]
    )


def q_unigram_tokenize(spark, sf_dir):
    """SentencePiece-style unigram-LM tokenizer (operators/unigram.py,
    Kudo ACL'18): seed substring vocab → EM forward-backward over the
    word census → rounded-prob prune → Viterbi encode with fixed
    tie-break. Rows-only by driver necessity (EM is iterative); exact
    ground truth is the pure-Python reference differential in
    tests/test_unigram.py (identical piece sets + encodings)."""
    from spider_spark.operators import unigram as ug

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pieces = ug.train_unigram(
        docs, vocab_size=80, seed_size=500, em_iters=2
    )
    return ug.encode_unigram(docs, pieces).orderBy("id")


def q_section_chunks(spark, sf_dir):
    """Section-aware chunking (content.section_chunks): pages split at
    their h1–h6 elements, each section paired with its introducing
    heading — the structure-respecting alternative to fixed token
    windows. HTML synthesized arithmetically (title trap in <head>,
    entity in a heading, doc text as section bodies) so the oracle
    derives expected sections from the construction while Spark must
    parse the real tags (the ai_optout_screen discipline)."""
    from spider_spark.operators import content as ct

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>Not A Heading</title></head><body>"),
            F.substring(F.coalesce("text", F.lit("")), 1, 40),
            F.lit("<h1>Part "),
            F.pmod(F.col("doc_id"), F.lit(5)).cast("string"),
            F.lit("</h1>"),
            F.substring(F.coalesce("text", F.lit("")), 41, 60),
            F.lit("<h2>Deep &amp; Wide</h2>"),
            F.substring(F.coalesce("text", F.lit("")), 101, 100000),
            F.lit("</body></html>"),
        ).alias("html"),
    )
    return ct.section_chunks(pages, id_col="doc_id")


def q_ai_optout_screen(spark, sf_dir):
    """ML-training opt-out screening (metarobots.screen_ai_optout):
    noai/noimageai robots tokens + the W3C TDMRep in-page reservation,
    with `trainable` as the export gate (noimageai alone still permits
    TEXT training). HTML synthesized arithmetically from doc_id — six
    directive variants incl. quote/case/junk-value traps — so the
    oracle derives ground truth from the construction while Spark must
    PARSE the real tag strings (the robots_policy_diff discipline)."""
    from spider_spark import metarobots as mr

    docs = _t(spark, sf_dir, "documents")
    variant = F.pmod(F.col("doc_id"), F.lit(6))
    meta = (
        F.when(variant == 0, F.lit('<meta name="robots" content="noai">'))
        .when(
            variant == 1,
            F.lit("<META NAME=robots CONTENT='noimageai , index'>"),
        )
        .when(variant == 2, F.lit('<meta name="tdm-reservation" content=1>'))
        .when(
            variant == 3, F.lit("<meta name='tdm-reservation' content='0'>")
        )
        .when(variant == 4, F.lit('<meta name="description" content="noai">'))
        .otherwise(F.lit(""))
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head>"), meta, F.lit("</head><body>x</body></html>")
        ).alias("html"),
    )
    return mr.screen_ai_optout(pages).select(
        "doc_id", "noai", "noimageai", "tdm_reserved", "trainable"
    )


def q_comb_fusion(spark, sf_dir):
    """CombSUM/CombMNZ score fusion (index.comb_fusion, Fox & Shaw
    TREC-2): min-max-normalized BM25 + Dirichlet-QL top-50 scores
    summed, MNZ multiplied by corroboration count. The oracle replays
    both rankers, both normalizations, and both combinations."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    a = idx.bm25_search(docs, "dup batch", k=50)
    b = idx.ql_dirichlet_search(docs, "dup batch", k=50, mu=2000.0)
    return idx.comb_fusion([a, b])


def q_team_draft_interleave(spark, sf_dir):
    """Team-draft interleaving (index.team_draft_interleave, Radlinski
    CIKM'08): the BM25 and Dirichlet-QL top-10 merged into the single
    list an online A/B would show, md5-deterministic captain coin.
    Sequential draft per query — not SQL-expressible without recursion,
    so rows-only; the pure-Python reference differential lives in
    tests/test_fusion_interleave.py."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    a = idx.bm25_search(docs, "dup batch", k=10).withColumn(
        "query_id", F.lit("dup batch")
    )
    b = idx.ql_dirichlet_search(docs, "dup batch", k=10, mu=2000.0).withColumn(
        "query_id", F.lit("dup batch")
    )
    return idx.team_draft_interleave(a, b)


def q_ranking_agreement(spark, sf_dir):
    """Ranker agreement (index.ranking_agreement): Spearman ρ
    (tie-averaged ranks) + Kendall τ-b between the BM25 and
    Dirichlet-QL top-50 for the same query — the experiment report that
    says whether two rankers genuinely reorder or merely rescale.
    Agreement over the id-intersection; oracle replays both rankers and
    both coefficients (rank windows + sign-pair census)."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    a = idx.bm25_search(docs, "dup batch", k=50)
    b = idx.ql_dirichlet_search(docs, "dup batch", k=50, mu=2000.0)
    return idx.ranking_agreement(a, b)


def q_allocation_fairness(spark, sf_dir):
    """Allocation fairness telemetry (adaptive.allocation_fairness):
    Gini + HHI + top-share over events-per-user — the scheduler-skew
    alarm shape (fetches per host at crawl scale). Computed on the
    DISTINCT-VALUE census (ties collapse the ranked sum, so no global
    per-key window); the oracle restates the per-key row_number
    definition and must agree exactly."""
    from spider_spark.operators import adaptive

    return adaptive.allocation_fairness(
        _t(spark, sf_dir, "events"), "user_id"
    )


def q_heaps_fit(spark, sf_dir):
    """Heaps'-law vocabulary-growth fit (textqc.heaps_fit, Manning IIR
    §5.1.1): one (ln N, ln V) point per source, OLS slope = β. The
    tail-growth drift alarm complementary to zipf_fit's head slope, and
    the dictionary-sizing projector (dict grows k·N^β). Oracle restates
    census → points → OLS sums."""
    from spider_spark.operators import textqc

    return textqc.heaps_fit(
        _t(spark, sf_dir, "documents"), group_col="source"
    )


def q_vocab_richness(spark, sf_dir):
    """Good-Turing coverage + Chao1 richness per source
    (textqc.vocab_richness; Good 1953, Chao 1984): unseen_mass = f1/N
    is the probability the next token from this source is a never-seen
    type — the keep-crawling-this-source signal beside recrawl's λ̂;
    chao1 bounds the source's true vocabulary. One (source, term)
    census then one per-source aggregate over census rows. Oracle
    restates census → frequency-of-frequencies → estimators."""
    from spider_spark.operators import textqc

    return textqc.vocab_richness(
        _t(spark, sf_dir, "documents"), group_col="source"
    )


def q_lang_mixture(spark, sf_dir):
    """CCNet-style per-segment language screening (langid.lang_mixture
    over langid.token_window_segments, Wenzek et al. LREC 2020): train
    the char-trigram NB on the 80% split, classify each 12-token window
    of the held-out docs, roll up per-doc (n_segments, n_langs,
    majority_lang, majority_frac) — the uniformity verdict a language
    filter needs so a 10%-English doc can't pass on its header. The
    oracle replays train + window split + score + rollup end-to-end."""
    from spider_spark.operators import langid

    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 < 8)
    probe = docs.where(F.col("doc_id") % 10 >= 8)
    grams, labels = langid.train_nb_langid(train)
    segs = langid.token_window_segments(probe, window_tokens=12).select(
        F.concat_ws(":", "doc_id", "p_idx").alias("seg"), "text"
    )
    preds = langid.nb_classify(segs, grams, labels, id_col="seg").withColumn(
        "doc_id", F.split("seg", ":")[0].cast("long")
    )
    return langid.lang_mixture(preds)


def q_leakage_safe_splits(spark, sf_dir):
    """Cluster-hashed train/val/test assignment (curation.
    leakage_safe_splits over curation.exact_dup_cluster_ids): every
    byte-identical duplicate lands in the SAME split — the Dodge et al.
    EMNLP'21 C4 train/test-contamination fix assign_splits alone cannot
    give. Spark groups by the md5 fingerprint so text never rides the
    shuffle; the oracle groups by the text itself — same clusters."""
    from spider_spark.operators import curation as cu

    docs = _t(spark, sf_dir, "documents")
    return cu.leakage_safe_splits(
        cu.exact_dup_cluster_ids(docs), "cluster_id", val_pct=5, test_pct=5
    ).select("doc_id", "cluster_id", "bucket", "split")


def q_bm25_maxp_search(spark, sf_dir):
    """Passage-level BM25 MaxP top-10 (index.bm25_maxp_search, Callan
    SIGIR'94 / Dai & Callan SIGIR'19): docs scored by their best
    16-token passage over the passage-corpus BM25 universe. The oracle
    restates the passage split (zipped unnest // 16), both roundings,
    and the struct-max argmax with negated p_idx."""
    from spider_spark.operators import index as index_ops

    docs = _t(spark, sf_dir, "documents")
    return index_ops.bm25_maxp_search(
        docs, "merge spark window", k=10, passage_tokens=16
    )


def q_weighted_sample_per_source(spark, sf_dir):
    """Efraimidis-Spirakis weighted sample (curation.weighted_sample,
    A-ES 2006): 20 docs per source with inclusion probability
    proportional to text length — the lottery a training mixture draws
    when it wants quality-biased but not winner-take-all selection.
    Randomness is md5-of-id (col_hash_uniform), so the oracle replays
    the exact same draw; ranking on the ROUNDED log-key (then id) keeps
    last-ulp ln() divergence from flipping an ordering."""
    from pyspark.sql import functions as F

    from spider_spark.operators import curation as cu

    docs = _t(spark, sf_dir, "documents").withColumn(
        "weight",
        (F.length(F.coalesce(F.col("text"), F.lit(""))) + 1).cast("double"),
    )
    return cu.weighted_sample(
        docs, k=20, weight_col="weight", strata_col="source"
    ).select("doc_id", "source", "sample_key_r", "sample_rank")


def q_bm25_search_collapsed(spark, sf_dir):
    """Host-collapsed SERP top-10 (index.bm25_search_diversified): summed
    BM25 over the query terms, at most 1 result per source (site
    collapsing), global top-10 via TakeOrdered. The oracle restates the
    BM25 formula and the per-host row_number cap."""
    from spider_spark.operators import index as index_ops

    docs = _t(spark, sf_dir, "documents")
    return index_ops.bm25_search_diversified(
        docs, "merge spark window", k=10, per_host=1, host_col="source"
    )


def q_term_suggestions(spark, sf_dir):
    """Did-you-mean spelling suggestions (index.term_suggestions, IIR
    §3.3): bigram-index candidates for the misspelling 'sart', exact
    levenshtein <= 2 verify, ranked (dist, df DESC, term) — 'fast' is in
    edit range but shares no bigram, exercising the candidate-recall
    heuristic. The oracle restates the k-gram explode via list_transform
    + list_distinct and uses DuckDB's levenshtein."""
    from spider_spark.operators import index as index_ops

    docs = _t(spark, sf_dir, "documents")
    return index_ops.term_suggestions(docs, "sart", max_dist=2, n=10)


def q_cocitation(spark, sf_dir):
    """Related-page pairs by co-citation (graph.cocitation_similarity):
    nodes sharing ≥2 in-linkers, jaccard over capped in-linker sets. The
    fanout cap (directory-page stop-word rule) bounds the pair shuffle at
    |E|·max_fanout."""
    from spider_spark.operators import graph as graph_ops

    docs = _t(spark, sf_dir, "documents")
    return graph_ops.cocitation_similarity(_md5_random_edges(docs), min_common=2)


def q_sequence_pack(spark, sf_dir):
    """Concat-and-chunk sequence packing (packing.pack_concat_chunks):
    per md5-hash shard, docs laid end-to-end (+1 EOD slot each) in id
    order, cut every 256 tokens. One row per doc×chunk piece — the
    loader index for materializing training sequences. The oracle
    restates the running-sum window + generate_series span in SQL."""
    from spider_spark.operators import packing, textqc

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        textqc.col_token_count("text").cast("long").alias("n_tokens"),
    )
    return packing.pack_concat_chunks(docs, seq_len=256, n_shards=8)


def q_sequence_pack_stats(spark, sf_dir):
    """Per-shard packing audit: chunks, content tokens, overhead and
    utilization over the q_sequence_pack output."""
    from spider_spark.operators import packing, textqc

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        textqc.col_token_count("text").cast("long").alias("n_tokens"),
    )
    packed = packing.pack_concat_chunks(docs, seq_len=256, n_shards=8)
    st = packing.packing_stats(packed, 256)
    return st.select(
        "shard",
        "n_chunks",
        "content_tokens",
        "n_docs",
        "overhead_tokens",
        F.round("utilization", 6).alias("utilization_r"),
    )


def q_shard_manifest(spark, sf_dir):
    """Deterministic export manifest: per shard doc count, char sum and
    an order-independent md5-prefix-sum checksum — the integrity record
    a shard export ships with (engine-portable, DuckDB-reproducible)."""
    from spider_spark.operators import packing

    return packing.shard_manifest(_t(spark, sf_dir, "documents"), n_shards=16)


def q_pack_bins_ffd(spark, sf_dir):
    """First-fit-decreasing bin packing, documents atomic (rows-only:
    FFD's first-fit scan is not SQL-expressible; the pytest differential
    against a brute-force reference is the correctness gate)."""
    from spider_spark.operators import packing, textqc

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        textqc.col_token_count("text").cast("long").alias("n_tokens"),
    )
    return packing.pack_bins_ffd(docs, seq_len=512, n_shards=8)


def q_unicode_nfc(spark, sf_dir):
    """Unicode NFC normalization (textnorm.normalize_unicode, Arrow-
    batched pandas UDF with C-level ASCII fast path): documents text is
    salted with DECOMPOSED fragments (combining acute U+0301 / ring
    U+030A) that NFC must recompose. Oracle: DuckDB nfc_normalize over
    the same chr()-built fragments — two independent NFC
    implementations (Python unicodedata vs DuckDB's utf8proc) must
    produce byte-identical text."""
    from spider_spark.operators import textnorm

    docs = _t(spark, sf_dir, "documents")
    frag = F.when(
        F.col("doc_id") % 3 == 0, F.lit(" Café")
    ).when(F.col("doc_id") % 3 == 1, F.lit(" Ångström")).otherwise(
        F.lit(" ascii")
    )
    salted = docs.select(
        "doc_id", F.concat(F.col("text"), frag).alias("text")
    )
    return textnorm.normalize_unicode(salted).select(
        "doc_id", F.col("text").alias("nfc_text")
    )


def q_mojibake_repair(spark, sf_dir):
    """Mojibake repair (textnorm.fix_mojibake, ftfy-lite inverse
    transcoding): each doc's text is salted with non-ASCII, garbled the
    way a charset bug garbles it (UTF-8 bytes decoded as cp1252), then
    repaired. Oracle: the UN-garbled salted text — repair must be an
    exact inverse, so the oracle is pure string concat."""
    from spider_spark.operators import textnorm

    docs = _t(spark, sf_dir, "documents")
    # fragment chars chosen so every UTF-8 byte is cp1252-mappable
    frag = F.lit(" é—“ok")
    salted = docs.select(
        "doc_id", F.concat(F.col("text"), frag).alias("text")
    )
    garbled = salted.select(
        "doc_id", textnorm.col_garble_cp1252("text").alias("text")
    )
    return textnorm.fix_mojibake(garbled).select(
        "doc_id", F.col("text").alias("fixed_text")
    )


def q_nb_langid(spark, sf_dir):
    """Trained char-trigram Naive Bayes language ID
    (operators/langid.py): train on the deterministic 80% split
    (doc_id % 10 < 8) of `documents` using its `lang` labels, score the
    held-out 20%. Pure Catalyst train AND score, so the DuckDB oracle
    replays the whole pipeline (Lidstone smoothing, per-label unknown
    mass, prior-only gram-less docs, (score, label)-greatest argmax)
    end-to-end. Scores rounded to 4 decimals — summation order differs
    between engines and doubles carry ~1e-9 absolute error at these
    magnitudes."""
    from spider_spark.operators import langid

    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 < 8)
    probe = docs.where(F.col("doc_id") % 10 >= 8)
    grams, labels = langid.train_nb_langid(train)
    preds = langid.nb_classify(probe, grams, labels)
    return preds.select(
        "doc_id", "pred_label", F.round("score", 4).alias("score_r")
    )


def q_corpus_datacard(spark, sf_dir):
    """Release data card (operators/datacard.py): per-(source, lang) /
    per-source / grand-total doc, token, char counts + length bands,
    all grouping sets in ONE rollup pass (single Exchange — asserted in
    tests). Exact aggregates only, so DuckDB's GROUP BY ROLLUP replays
    it bit-for-bit (GROUPING() shares grouping_id()'s bit encoding)."""
    from spider_spark.operators import datacard

    return datacard.corpus_datacard(_t(spark, sf_dir, "documents"))


def q_mirror_hosts(spark, sf_dir):
    """Mirror-host detection (operators/mirrors.py): sources are hosts,
    md5-prefix(text) the content fingerprint. Mirrors are PLANTED
    deterministically — every 5th doc is re-served by '<source>-m' —
    and a boilerplate fingerprint (fp 42) is planted on EVERY host so
    the hot-fp guard provably fires (20 sources > MAX_HOSTS_PER_FP=16;
    without the guard every host pair would share it). The oracle
    replays plant → profile → guard → pair census → overlap."""
    from spider_spark.operators import mirrors

    docs = _t(spark, sf_dir, "documents")
    fp = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
    real = docs.select(F.col("source").alias("host"), fp.alias("content_fp"))
    mirrored = docs.where(F.col("doc_id") % 5 == 0).select(
        F.concat(F.col("source"), F.lit("-m")).alias("host"),
        fp.alias("content_fp"),
    )
    # fp 42 as a NON-FOLDABLE expression (pmod(hash(col),1) is always 0 —
    # the join_scalar_frame idiom): a literal here lets Catalyst constant-
    # fold the hot-fp guard's semi-join key for this union branch into a
    # 1-row NL existence probe, tripping the strict no-NL plan guard
    boiler = docs.select(F.col("source").alias("host")).union(
        docs.where(F.col("doc_id") % 5 == 0).select(
            F.concat(F.col("source"), F.lit("-m")).alias("host")
        )
    ).distinct().select(
        "host",
        (F.pmod(F.hash(F.col("host")), F.lit(1)) + F.lit(42)).cast("long").alias(
            "content_fp"
        ),
    )
    pages = real.union(mirrored).union(boiler)
    return mirrors.mirror_candidates(pages, min_overlap=0.5, min_shared=3)


def q_soft404_screen(spark, sf_dir):
    """Soft-404 screening (textqc.soft404_flags): error phrases are
    planted on every 7th doc (every 11th doc gets a REAL 404 status so
    the 200-gate is exercised), tiny pages on doc_id%7==1. The oracle
    inlines the SAME SOFT404_RE — Java regex and DuckDB RE2 agree on
    this ASCII alternation with (?i) and word boundaries."""
    docs = _t(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.lit(404))
        .otherwise(F.lit(200))
        .alias("status"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("Sorry, Page Not Found. "), F.col("text")),
        )
        .when(F.col("doc_id") % 7 == 1, F.lit("tiny landing page"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return textqc.soft404_flags(salted).select(
        "doc_id", "s404_phrase", "suspect_tiny", "soft404"
    )


def q_snapshot_diff(spark, sf_dir):
    """Crawl-to-crawl delta (recrawl.snapshot_diff): two snapshots are
    derived deterministically from `documents` — the new wave drops
    every 13th URL (removed), rewrites every 7th body (changed), adds a
    new URL per 17th doc, and null-fps every 19th new row (a 304 ledger
    row: value→null must read `changed`, null==null `unchanged`). One
    full-outer join on the canonical key is the whole plan."""
    from spider_spark.operators import recrawl

    docs = _t(spark, sf_dir, "documents")
    fp = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
    url = F.concat(F.lit("u"), F.col("doc_id"))
    old = docs.select(url.alias("url_canon"), fp.alias("content_fp"))
    kept = docs.where(F.col("doc_id") % 13 != 0)
    new_body = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    new_fp = F.when(
        F.col("doc_id") % 19 == 0, F.lit(None).cast("long")
    ).otherwise(F.conv(F.substring(F.md5(new_body), 1, 8), 16, 10).cast("long"))
    new = kept.select(url.alias("url_canon"), new_fp.alias("content_fp"))
    added = docs.where(F.col("doc_id") % 17 == 0).select(
        F.concat(F.lit("u"), F.col("doc_id") + 1000000).alias("url_canon"),
        F.conv(
            F.substring(F.md5(F.concat(F.col("text"), F.lit(" new"))), 1, 8),
            16,
            10,
        ).cast("long").alias("content_fp"),
    )
    return recrawl.snapshot_diff(old, new.union(added))


def q_url_alias_clusters(spark, sf_dir):
    """URL alias consolidation (graph.canonical_url_clusters): redirect/
    rel=canonical chains u{4k+3}→u{4k+2}→u{4k+1}→u{4k} derived
    deterministically from doc_ids; every quad collapses to one
    identity whose representative is the TERMINAL u{4k} (never a
    source), not the lexicographic min. Oracle: recursive-CTE closure +
    the same terminal-preferring argmin."""
    from spider_spark.operators import graph

    docs = _t(spark, sf_dir, "documents")
    edges = docs.where(F.col("doc_id") % 4 != 0).select(
        F.concat(F.lit("u"), F.col("doc_id")).alias("src"),
        F.concat(F.lit("u"), F.col("doc_id") - 1).alias("dst"),
    )
    return graph.canonical_url_clusters(edges)


def q_registered_domains(spark, sf_dir):
    """Registered-domain (eTLD+1) rollup (operators/domains.py): hosts
    synthesized from doc_ids cover every rule branch — a subdomain farm
    under a multi-label suffix (s{n}.megafarm.co.uk), a .com farm, a
    one-host-per-doc domain (site{id}.example.org, all collapsing to
    example.org), and IPv4 literals (pass-through). The oracle
    implements the GENERAL eTLD+1 rule in SQL (same suffix list
    inlined), not the shapes — a real differential."""
    from spider_spark.operators import domains

    docs = _t(spark, sf_dir, "documents")
    host = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("s"), F.col("doc_id") % 37, F.lit(".megafarm.co.uk")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("blog"), F.col("doc_id") % 11, F.lit(".farm.com")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("site"), F.col("doc_id"), F.lit(".example.org")),
        )
        .otherwise(F.concat(F.lit("10.0."), F.col("doc_id") % 200, F.lit(".7")))
    )
    urls = docs.select(host.alias("host"))
    return domains.domain_rollup(urls)


def q_opic(spark, sf_dir):
    """OPIC online importance (graph.opic, Abiteboul WWW'03): 2 cash
    sweeps over a deterministic doc_id link graph (with dangling nodes
    so the virtual-root redistribution is exercised). Oracle: the
    sweeps unrolled in SQL, same shape as the pagerank_2iter oracle."""
    from spider_spark.operators import graph

    docs = _t(spark, sf_dir, "documents")
    edges = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 11 + 5) % 150).alias("dst"),
    ).union(
        docs.where(F.col("doc_id") % 3 == 0).select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 17 + 2) % 150).alias("dst"),
        )
    )
    return graph.opic(edges, iters=2).select(
        "node", F.round("importance", 6).alias("imp_r")
    )


def q_tfidf_top_terms(spark, sf_dir):
    """Inverted index + TF-IDF keyword extraction (operators/index.py):
    top-3 terms per document, ranked on the ROUNDED score then term so
    the window is deterministic across engines."""
    from spider_spark.operators import index as idx

    return idx.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


def _link_edges(docs):
    """The deterministic doc_id link graph shared by the link-rank
    queries (same construction as q_opic)."""
    return docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 11 + 5) % 150).alias("dst"),
    ).union(
        docs.where(F.col("doc_id") % 3 == 0).select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 17 + 2) % 150).alias("dst"),
        )
    )


def q_hits(spark, sf_dir):
    """HITS hubs & authorities (graph.hits, Kleinberg JACM'99): 2
    L1-normalized sweeps over the shared deterministic link graph.
    Oracle: the sweeps unrolled in SQL."""
    from spider_spark.operators import graph

    return graph.hits(_link_edges(_t(spark, sf_dir, "documents")), iters=2).select(
        "node", F.round("hub", 6).alias("hub_r"), F.round("auth", 6).alias("auth_r")
    )


def q_salsa(spark, sf_dir):
    """SALSA (graph.salsa, Lempel & Moran TOIT'01): the degree-normalized
    bipartite walk that cures HITS's tightly-knit-community capture — 2
    L1-normalized sweeps over the shared deterministic link graph.
    Oracle: sweeps unrolled with outdeg/indeg censuses."""
    from spider_spark.operators import graph

    return graph.salsa(
        _link_edges(_t(spark, sf_dir, "documents")), iters=2
    ).select(
        "node", F.round("hub", 6).alias("hub_r"),
        F.round("auth", 6).alias("auth_r"),
    )


def q_trustrank(spark, sf_dir):
    """TrustRank (graph.trustrank, Gyöngyi VLDB'04): 2 damped sweeps with
    the teleport confined to the doc_id%50==0 trusted seeds; trust decays
    with link distance, spam-side nodes unreachable from seeds get 0."""
    from spider_spark.operators import graph

    docs = _t(spark, sf_dir, "documents")
    seeds = docs.where(F.col("doc_id") % 50 == 0).select(F.col("doc_id").alias("node"))
    return graph.trustrank(_link_edges(docs), seeds, iters=2).select(
        # +1e-12 pre-round bias: see q_pagerank — trust terms
        # (0.01·0.85^k/2^m) sit exactly on x.5e-6 boundaries
        "node", F.round(F.col("trust") + F.lit(1e-12), 6).alias("trust_r")
    )


def q_bfs_depth(spark, sf_dir):
    """BFS min-hop crawl depth from the doc_id%100==0 seeds, capped at 3
    hops (graph.bfs_depth — the Heritrix max-hops scope rule). Oracle: a
    depth-bounded recursive CTE taking MIN(depth) per node."""
    from spider_spark.operators import graph

    docs = _t(spark, sf_dir, "documents")
    seeds = docs.where(F.col("doc_id") % 100 == 0).select(F.col("doc_id").alias("node"))
    return graph.bfs_depth(_link_edges(docs), seeds, max_depth=3)


def q_bm25_search(spark, sf_dir):
    """BM25 top-10 retrieval (operators/index.py, Robertson & Zaragoza
    2009 with Lucene's non-negative idf) for a fixed 3-term query over
    the documents table; global top-k is TakeOrderedAndProject, never a
    single-partition window sort."""
    from spider_spark.operators import index as idx

    return idx.bm25_search(_t(spark, sf_dir, "documents"), "spark window merge", k=10)


def q_focused_relevance(spark, sf_dir):
    """Focused-crawl link propagation (Chakrabarti WWW'99,
    graph.relevance_to_targets): each link target inherits the best BM25
    relevance (vs a fixed topic query) among its parents — one O(|E|)
    join + per-dst max."""
    from spider_spark.operators import graph
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    scores = idx.bm25_query_scores(docs, "spark window merge")
    return graph.relevance_to_targets(_link_edges(docs), scores).select(
        "node", F.round("relevance", 6).alias("rel_r")
    )


def q_host_pagerank(spark, sf_dir):
    """Host-graph rank (graph.host_graph + graph.weighted_pagerank): URL
    edges coarsened to hosts (deterministic doc_id%20 host synthesis so
    the authority extraction is exercised), intra-host self-loops
    dropped, edge weight = underlying link count, then 2 weighted-rank
    sweeps. THE scale move: at 10^10 URLs the host graph is ~10^7 nodes."""
    from spider_spark.operators import graph

    docs = _t(spark, sf_dir, "documents")
    e = _link_edges(docs).select(
        F.concat(
            F.lit("https://h"),
            (F.col("src") % 20).cast("string"),
            F.lit(".test/p"),
            F.col("src").cast("string"),
        ).alias("src"),
        F.concat(
            F.lit("https://h"),
            (F.col("dst") % 20).cast("string"),
            F.lit(".test/p"),
            F.col("dst").cast("string"),
        ).alias("dst"),
    )
    hg = graph.host_graph(e)
    return graph.weighted_pagerank(hg, iters=2, src="src_host", dst="dst_host").select(
        # +1e-12 pre-round bias: see q_pagerank (same boundary hazard)
        "node", F.round(F.col("rank") + F.lit(1e-12), 6).alias("rank_r")
    )


def _dust_pages(docs):
    """Deterministic (url, content_fp) ledger for DUST rule learning:
    content is keyed by the `id` param (fp = doc_id%7); `sess` varies
    freely (doc_id%4==0 rows pin sess=fixed so `id` gets a shared-sess
    counterexample group)."""
    return docs.select(
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".test/page?id="),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("&sess="),
            F.when(F.col("doc_id") % 4 == 0, F.lit("fixed")).otherwise(
                F.col("doc_id").cast("string")
            ),
        ).alias("url"),
        (F.col("doc_id") % 7).alias("content_fp"),
    )


def q_dust_rules(spark, sf_dir):
    """DUST junk-param learning (operators/dust.py, Bar-Yossef WWW'07
    pair-free restatement): per-(host, param) evidence/counterexample
    census over remainder groups; `sess` learns junk, `id` is saved by
    its shared-sess counterexamples."""
    from spider_spark.operators import dust

    return dust.dust_param_rules(_dust_pages(_t(spark, sf_dir, "documents")))


def q_dust_strip(spark, sf_dir):
    """Apply the learned DUST rules: junk params removed (order of
    survivors preserved), hosts without rules untouched."""
    from spider_spark.operators import dust

    pages = _dust_pages(_t(spark, sf_dir, "documents"))
    return dust.strip_junk_params(pages, dust.dust_param_rules(pages)).select(
        "url", "url_dusted"
    )


def q_postings_merge(spark, sf_dir):
    """Incremental index maintenance (index.merge_postings): a recrawl
    delta (doc_id%10==0, text refreshed) and a deletion set (doc_id%25==0,
    deletion beating refresh on the overlap) merged into the standing
    postings. The ORACLE IS THE FULL REBUILD over the substituted corpus —
    the differential the operator's invariant promises."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    old = idx.postings(docs)
    delta = docs.where(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(" refreshed refreshed")).alias(
            "text"
        ),
    )
    deleted = docs.where(F.col("doc_id") % 25 == 0).select("doc_id")
    return idx.merge_postings(old, delta, deleted)


def q_degree_histogram(spark, sf_dir):
    """log2-bucketed in-degree histogram (graph.degree_histogram): the
    power-law fingerprint of the link graph in a handful of rows."""
    from spider_spark.operators import graph

    return graph.degree_histogram(_link_edges(_t(spark, sf_dir, "documents")), "in")


def q_ngram_containment(spark, sf_dir):
    """Asymmetric containment (dedup.ngram_containment, Broder 1997)
    over adjacent-id pairs with PLANTED swallowing: text_b is text_a
    concatenated with the next doc, so cont_ab ≈ 1 while Jaccard is
    small — the syndication/quoting signal."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("text_b"))
    pairs = (
        a.join(b, a.id_a + 1 == b.id_b)
        .filter(F.col("id_a") % 10 == 0)
        .withColumn("text_b", F.concat(F.col("text_a"), F.lit(" "), F.col("text_b")))
    )
    return dedup.ngram_containment(pairs).select(
        "id_a",
        "id_b",
        F.round("cont_ab", 4).alias("cont_ab_r"),
        F.round("cont_ba", 4).alias("cont_ba_r"),
    )


def q_contract_edges(spark, sf_dir):
    """Alias-contracted link graph (graph.contract_edges): even doc_ids
    map to canonical doc_id - doc_id%4; parallel edges collapse with
    weights, contraction-created self-loops dropped, unmapped nodes keep
    themselves."""
    from spider_spark.operators import graph

    docs = _t(spark, sf_dir, "documents")
    mapping = docs.where(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("node"),
        (F.col("doc_id") - F.col("doc_id") % 4).alias("canonical_url"),
    )
    return graph.contract_edges(_link_edges(docs), mapping)


def q_kmeans_codebook(spark, sf_dir):
    """IVF codebook training (similarity.kmeans_lloyd — spherical
    k-means, Dhillon & Modha 2001): 2 Lloyd sweeps, k=8, init = the 8
    lowest-id vectors quantized to 6 decimals. Assignment is the
    map-only SQL-literal codebook path (corpus never shuffles); each
    sweep's centroids are rounded to 6 so both engines' float sums
    agree. Output is per-dim rows (cent_id, dim, value_r) — scalar
    columns, no array-stringification ambiguity in the compare."""
    from spider_spark.operators import similarity as sim

    return sim.kmeans_lloyd(_t(spark, sf_dir, "embeddings"), k=8, iters=2)


def q_reciprocal_links(spark, sf_dir):
    """Reciprocal-link nepotism stats (graph.reciprocal_link_stats,
    Davison 2000) over the host graph: fraction of each host's distinct
    out-neighbors that link straight back."""
    from spider_spark.operators import graph

    docs = _t(spark, sf_dir, "documents")
    e = _link_edges(docs).select(
        F.concat(
            F.lit("https://h"),
            (F.col("src") % 20).cast("string"),
            F.lit(".test/p"),
            F.col("src").cast("string"),
        ).alias("src"),
        F.concat(
            F.lit("https://h"),
            (F.col("dst") % 20).cast("string"),
            F.lit(".test/p"),
            F.col("dst").cast("string"),
        ).alias("dst"),
    )
    return graph.reciprocal_link_stats(graph.host_graph(e))


def q_path_template_census(spark, sf_dir):
    """URL path-template census (dust.path_template_census): four
    permalink shapes cycled by doc_id % 4 across 10 hosts — numeric ids,
    dated archives, 32-hex cache segments, a static page. The oracle
    derives (host, template, counts, first_url) from the construction
    while Spark must normalize the real paths."""
    from spider_spark.operators import dust

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = F.concat(F.lit("h"), (d % 10).cast("string"), F.lit(".test"))
    b = d % 4
    url = F.concat(
        F.lit("https://"),
        host,
        F.when(b == 0, F.concat(F.lit("/product/"), d.cast("string")))
        .when(
            b == 1,
            F.concat(
                F.lit("/2020/"), (d % 12 + 1).cast("string"),
                F.lit("/page-"), d.cast("string"), F.lit(".html"),
            ),
        )
        .when(
            b == 2,
            F.concat(
                F.lit("/cache/"), F.md5(d.cast("string")), F.lit("/x?q="),
                d.cast("string"),
            ),
        )
        .otherwise(F.lit("/about")),
    )
    return dust.path_template_census(docs.select(url.alias("url")))


def q_truncation_recall(spark, sf_dir):
    """Dimension-truncation recall curve
    (similarity.truncation_recall_curve): recall@5 of prefix-truncated
    cosine top-k (dims 8/16/32/64) vs the full 64-dim ground truth,
    probes = vec_id 0-3, corpus = the rest. The oracle recomputes both
    rankings with DuckDB list_cosine_similarity and the same
    (cosine desc, id) tie-break."""
    from spider_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    return similarity.truncation_recall_curve(
        emb.filter(F.col("vec_id") >= 4), probes, dims=[8, 16, 32, 64], k=5
    )


def q_publish_date_fusion(spark, sf_dir):
    """Publication-date fusion (structured.publish_date_fusion): doc_id %
    5 plants jsonld-only / meta-only / url-only / all-three (jsonld must
    win) / none. Day = 10 + doc_id % 10 keeps every branch
    data-dependent. Oracle derives (pub_date, pub_source) per branch."""
    from spider_spark.operators import structured as st

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    dd = (F.lit(10) + d % 10).cast("string")
    ld_island = F.concat(
        F.lit('<script type="application/ld+json">'
              '{"@type": "Article", "datePublished": "2022-03-'),
        dd,
        F.lit('T09:00:00Z"}</script>'),
    )
    meta_tag = F.concat(
        F.lit('<meta property="article:published_time" content="2023-11-'),
        dd,
        F.lit('T12:00:00+00:00">'),
    )
    branch = d % 5
    html = F.concat(
        F.lit("<html><head>"),
        F.when(branch.isin(0, 3), ld_island).otherwise(F.lit("")),
        F.when(branch.isin(1, 3), meta_tag).otherwise(F.lit("")),
        F.lit("</head><body>x</body></html>"),
    )
    url = F.when(
        branch.isin(2, 3),
        F.concat(F.lit("https://x.test/2020/07/"), dd, F.lit("/a")),
    ).otherwise(F.lit("https://x.test/p"))
    pages = docs.select("doc_id", html.alias("html"), url.alias("url"))
    return st.publish_date_fusion(
        pages, id_col="doc_id", url_col="url"
    )


def q_sniff_content_type(spark, sf_dir):
    """Magic-byte sniffing (multimodal.sniff_content_type): six payload
    shapes cycled by doc_id % 6 — %PDF, PNG magic, <!DOCTYPE, GIF89a,
    unsigned plain text, null — with the doc text as body bytes. The
    oracle derives the expected type per branch; Spark must hex-match
    real binary prefixes."""
    from spider_spark.operators import multimodal as mm

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    body = F.col("text").cast("binary")
    content = (
        F.when(d % 6 == 0, F.concat(F.lit("%PDF-1.4 ").cast("binary"), body))
        .when(d % 6 == 1, F.concat(F.unhex(F.lit("89504E470D0A1A0A")), body))
        .when(
            d % 6 == 2,
            F.concat(F.lit("<!DOCTYPE html><p>").cast("binary"), body),
        )
        .when(d % 6 == 3, F.concat(F.unhex(F.lit("474946383961")), body))
        .when(d % 6 == 4, body)
        .otherwise(F.lit(None).cast("binary"))
    )
    return mm.sniff_content_type(
        docs.select("doc_id", content.alias("content"))
    ).select("doc_id", "sniffed_type", "type_sniffable")


def q_outlink_novelty(spark, sf_dir):
    """Frontier-yield signal (ordering.outlink_novelty): per-page fraction
    of outlinks leading somewhere unseen. Outlink targets L{(3d+j) % 900}
    for j ≤ d % 4; the seen set holds exactly the EVEN targets, so a
    link is novel iff its target is odd — the oracle counts parity
    directly while Spark must run the distinct + anti-join + rollup.
    Every 7th page has no outlinks (null link row) and must surface with
    novelty 0."""
    from spider_spark.operators import ordering

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    links_arr = F.when(
        d % 7 == 0, F.array(F.lit(None).cast("string"))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), (d % 4).cast("int")),
            lambda j: F.concat(F.lit("L"), ((d * 3 + j) % 900).cast("string")),
        )
    )
    captures = docs.select(
        F.concat(F.lit("p"), d.cast("string")).alias("url"),
        F.explode(links_arr).alias("link"),
    )
    seen = docs.select(
        F.concat(F.lit("L"), ((d * 2) % 900).cast("string")).alias("url_canon")
    )
    return ordering.outlink_novelty(captures, seen)


def q_code_fraction(spark, sf_dir):
    """Code-likeness census (textqc.code_fraction): every 4th doc gets a
    4-line code block appended (semicolon/brace ends, keyword head,
    indent); the oracle replays the same per-line cue regexes in DuckDB
    (all RE2-safe, shared verbatim)."""
    docs = _t(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(
            F.col("text"),
            F.lit(
                "\nreturn x == y;\nfunction f() {\n    indented(1);\n}"
            ),
        ),
    ).otherwise(F.col("text"))
    return textqc.code_fraction(
        docs.select("doc_id", planted.alias("text"))
    )


def q_idn_host_audit(spark, sf_dir):
    """IDN/homograph host audit (domains.idn_host_audit): six planted
    host shapes cycled by doc_id % 6 — plain ASCII, ordinary IDN
    (münchen.de), all-Cyrillic homograph (аррӏе.com — NOT mixed), a
    truly mixed label (аpple.com — flagged), CJK, and an invalid
    punycode label. The oracle pins the expected decode per case (DuckDB
    cannot run RFC 3492 — the decode itself is what is under test)."""
    from spider_spark.operators import domains

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = (
        F.when(d % 6 == 0, F.concat(F.lit("h"), d.cast("string"), F.lit(".example.com")))
        .when(d % 6 == 1, F.lit("xn--mnchen-3ya.de"))
        .when(d % 6 == 2, F.lit("xn--80ak6aa92e.com"))
        .when(d % 6 == 3, F.lit("xn--pple-43d.com"))
        .when(d % 6 == 4, F.lit("xn--fiq228c.cn"))
        .otherwise(F.lit("xn--999999999.com"))
    )
    return domains.idn_host_audit(docs.select(host.alias("host"))).select(
        "host", "is_idn", "unicode_host", "scripts", "mixed_script",
        "decode_error",
    )


def q_markup_density(spark, sf_dir):
    """Page-level markup density (content.markup_density): head/style
    stripped, doc text as the article body, doc_id % 3 planted anchors —
    the oracle reconstructs the same HTML string for html_chars and
    derives text/link chars arithmetically (collapsed text length +
    per-anchor 'LINK'+digits)."""
    from spider_spark.operators import content as ct

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    anchor = F.concat(
        F.lit('<a href="x">LINK'), d.cast("string"), F.lit("</a>")
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit(
                "<html><head><title>T</title><style>p{color:red}</style>"
                "</head><body><p>"
            ),
            F.col("text"),
            F.lit("</p>"),
            F.repeat(anchor, (d % 3).cast("int")),
            F.lit("</body></html>"),
        ).alias("html"),
    )
    return ct.markup_density(pages, id_col="doc_id")


def q_url_path_dates(spark, sf_dir):
    """URL-path date priors (dust.url_path_dates): permalink styles cycled
    by doc_id % 5 — /YYYY/MM/DD/, /YYYY-MM-DD.html, monthly /YYYY/MM/, an
    out-of-range /2024/13/40/ (must yield kind null), and dateless. The
    oracle derives (year, month, day, kind) from the construction."""
    from spider_spark.operators import dust

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    yy = (F.lit(2000) + d % 20).cast("string")
    mm = F.lpad((d % 12 + 1).cast("string"), 2, "0")
    dd = F.lpad((d % 28 + 1).cast("string"), 2, "0")
    url = (
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("https://b.test/"), yy, F.lit("/"), mm, F.lit("/"),
                dd, F.lit("/post-"), d.cast("string"),
            ),
        )
        .when(
            d % 5 == 1,
            F.concat(
                F.lit("https://b.test/news/"), yy, F.lit("-"), mm,
                F.lit("-"), dd, F.lit(".html"),
            ),
        )
        .when(
            d % 5 == 2,
            F.concat(F.lit("https://b.test/"), yy, F.lit("/"), mm, F.lit("/")),
        )
        .when(d % 5 == 3, F.lit("https://b.test/2024/13/40/x"))
        .otherwise(F.concat(F.lit("https://b.test/p/"), d.cast("string")))
    )
    return dust.url_path_dates(docs.select("doc_id", url.alias("url"))).select(
        "doc_id", "url_year", "url_month", "url_day", "url_date_kind"
    )


def q_template_shapes(spark, sf_dir):
    """DOM-shape template census (content.template_shapes): every doc is
    stamped from one of two templates whose tag SEQUENCES differ (every
    3rd doc adds a span) while every visible string and attribute varies
    per doc — the census must collapse on structure alone. Hosts cycle
    doc_id % 20. The oracle computes md5 over the statically-known tag
    sequences and counts arithmetically."""
    from spider_spark.operators import content as ct

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    pages = docs.select(
        "doc_id",
        F.concat(F.lit("h"), (d % 20).cast("string")).alias("host"),
        F.concat(
            F.lit("<html><head><title>Doc "),
            d.cast("string"),
            F.lit('</title></head><body><div class="c'),
            d.cast("string"),
            F.lit('"><p>'),
            F.substring(F.coalesce("text", F.lit("")), 1, 40),
            F.lit("</p></div>"),
            F.when(d % 3 == 0, F.lit("<span>x</span>")).otherwise(F.lit("")),
            F.lit("</body></html>"),
        ).alias("html"),
    )
    return ct.template_shapes(
        pages, id_col="doc_id", host_col="host", min_pages=2
    )


def q_outlink_farms(spark, sf_dir):
    """Link-farm detection (graph.outlink_farms): docs with
    doc_id % 10 ∈ {1,3,7} form a planted farm — identical 3-target
    outlink sets across 20 hosts (their background edges removed so the
    sets really are byte-identical); everyone else keeps the shared
    deterministic background graph, whose dst = (src*11+5) % 150
    congruences produce small organic same-set groups the census must
    also report. Oracle recomputes fingerprints + census in DuckDB."""
    from spider_spark.operators import graph

    docs = _t(spark, sf_dir, "documents")
    member = F.col("doc_id") % 10
    bg_docs = docs.filter(~member.isin(1, 3, 7))
    farm = (
        docs.filter(member.isin(1, 3, 7))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(F.array(F.lit(9001), F.lit(9002), F.lit(9003))).alias(
                "dst"
            ),
        )
    )
    edges = (
        _link_edges(bg_docs)
        .union(farm)
        .withColumn(
            "host", F.concat(F.lit("h"), (F.col("src") % 20).cast("string"))
        )
    )
    return graph.outlink_farms(
        edges, host_col="host", min_pages=3, min_hosts=2
    )


def _sketch_hosts(docs: DataFrame):
    """Deterministic zipf-ish host stream for the sketch queries: two
    planted heads (25% each) over a per-source tail (~1.25% each)."""
    d = F.col("doc_id")
    return docs.select(
        F.when(d % 4 == 0, F.lit("hot-a.example"))
        .when(d % 4 == 1, F.lit("hot-b.example"))
        .otherwise(F.concat(F.lit("tail-"), F.col("source")))
        .alias("host")
    )


def q_heavy_hitter_hosts(spark, sf_dir):
    """EXACT φ-heavy-hitter hosts via bounded-state Misra-Gries candidates
    + exact recount (sketches.heavy_hitters, Misra & Gries 1982 / Agarwal
    et al. 2012 mergeable form): keys with count > n/(k+1) at k=6 —
    the planted 25% heads pass, the ~1.25% tail cannot. The MG stage
    bounds intermediate state at k counters/partition; the oracle is the
    brute-force groupBy the sketch provably equals."""
    from spider_spark.operators import sketches as sk

    docs = _t(spark, sf_dir, "documents")
    return sk.heavy_hitters(_sketch_hosts(docs), "host", k=6).select(
        F.col("key").alias("host"), "cnt", "frac_r"
    )


def q_cms_host_counts(spark, sf_dir):
    """Count-Min Sketch point estimates (sketches.count_min_sketch +
    cms_estimate, Cormode & Muthukrishnan 2005) for every distinct host:
    depth=4 × width=64 md5-bucketed counters, estimate = min over rows.
    Engine-portable hashing means the oracle restates every counter
    bit-for-bit — including any collision overcounts."""
    from spider_spark.operators import sketches as sk

    docs = _t(spark, sf_dir, "documents")
    hosts = _sketch_hosts(docs)
    sketch = sk.count_min_sketch(hosts, "host", depth=4, width=64)
    return sk.cms_estimate(sketch, hosts, "host", depth=4, width=64).select(
        F.col("key").alias("host"), "est_cnt"
    )


def _capture_pair(spark, sf_dir):
    """Two deterministic captures of the documents table: %3==0 got an
    appended block, %3==1 unchanged, %3==2 fully rewritten; %10==0 gone
    from the recrawl."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    prev = docs.select("doc_id", F.coalesce("text", F.lit("")).alias("text"))
    curr = docs.where(d % 10 != 0).select(
        "doc_id",
        F.when(d % 3 == 0, F.concat(F.coalesce("text", F.lit("")), F.lit(" EDIT BLOCK APPENDED HERE")))
        .when(d % 3 == 1, F.coalesce("text", F.lit("")))
        .otherwise(F.concat(F.lit("completely rewritten page body "), d.cast("string")))
        .alias("text"),
    )
    return prev, curr


def q_capture_delta(spark, sf_dir):
    """Recrawl byte-delta ledger (chunking.capture_delta_stats): CDC chunk
    multisets compared across two captures — appended-block pages share
    most bytes, rewrites share none, vanished pages read all-change.
    Rolling hash → rows-only; the multiset-compare arithmetic is
    oracle-anchored by fixed_capture_delta."""
    from spider_spark.operators import chunking as ck

    prev, curr = _capture_pair(spark, sf_dir)
    enc = lambda df: df.select(
        F.col("doc_id").cast("string").alias("url"),
        F.encode("text", "UTF-8").alias("content"),
    )
    return ck.capture_delta_stats(
        enc(prev), enc(curr), mask_bits=6, min_size=32, max_size=512
    )


def q_fixed_capture_delta(spark, sf_dir):
    """Fixed-size capture delta (chunking.fixed_capture_delta) — the
    pure-Catalyst oracle anchor for the multiset compare, same synthetic
    capture pair."""
    from spider_spark.operators import chunking as ck

    prev, curr = _capture_pair(spark, sf_dir)
    return ck.fixed_capture_delta(prev, curr, chunk_chars=64)


def q_tokenizer_fertility(spark, sf_dir):
    """Tokenizer-fertility ledger (textqc.tokenizer_fertility): pieces
    per word and chars per piece under the GPT-style pre-tokenizer —
    the QA numbers that catch a corpus silently doubling its token
    bill."""
    from spider_spark.operators import textqc

    docs = _t(spark, sf_dir, "documents")
    return textqc.tokenizer_fertility(docs)


def q_ql_dirichlet(spark, sf_dir):
    """Dirichlet query-likelihood top-10 (index.ql_dirichlet_search,
    Zhai & Lafferty SIGIR 2001) for 'dup batch' at μ=2000 — the LM
    ranker beside BM25, so fusion combines genuinely different
    rankers."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    return idx.ql_dirichlet_search(docs, "dup batch", k=10, mu=2000.0)


def q_revisit_priority(spark, sf_dir):
    """Revisit-value ordering (recrawl.revisit_priority, Cho & GM 2003
    §6 greedy): rank · (1 − expected freshness) over the events-derived
    freshness ledger, rank synthesized arithmetically; null-λ̂ URLs read
    fully stale (never starved of evidence)."""
    import datetime as _dt

    from spider_spark.operators import recrawl

    ev = _t(spark, sf_dir, "events")
    rates = recrawl.change_rate(
        ev, url_col="user_id", ts_col="ts", fp_col="event_type", tiebreak_col="event_id"
    )
    last = ev.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    fresh = recrawl.expected_freshness(
        rates.join(last, "user_id"), _dt.datetime(2024, 3, 1), url_col="user_id"
    )
    ranks = ev.select("user_id").distinct().select(
        "user_id",
        (F.lit(1) + F.pmod(F.col("user_id") * 3, F.lit(7))).cast("double").alias("rank"),
    )
    return recrawl.revisit_priority(fresh, ranks, url_col="user_id")


def q_pruned_postings(spark, sf_dir):
    """Static index pruning (index.prune_postings_static, Carmel et al.
    SIGIR 2001): each term keeps its top-8 postings by impact via the
    two-phase salted top-k (hot-term windows bounded). Returns the
    surviving rows; the oracle is the naive single-window selection the
    salted form must equal."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    return idx.prune_postings_static(idx.bm25_scores(docs), lam=8, salt=4)


def q_query_clarity(spark, sf_dir):
    """Query-difficulty prediction (index.query_clarity, Cronen-Townsend
    et al. SIGIR 2002): KL between the 'dup' feedback language model
    (top-10 docs) and the collection model."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    return idx.query_clarity(
        idx.bm25_scores(docs), idx.postings(docs), "dup", k_fb=10
    )


def q_cori_shard_select(spark, sf_dir):
    """Federated shard selection (index.cori_shard_scores, Callan et al.
    SIGIR 1995) over the rendezvous-routed 4-shard split of the corpus:
    rank shards by query-fit from the tiny resource-description table
    (shard_term_stats), never the postings — the query-side complement
    of HRW document routing."""
    from spider_spark.operators import index as idx
    from spider_spark.operators import layout

    docs = _t(spark, sf_dir, "documents")
    sharded = layout.rendezvous_assign(
        docs.select("doc_id", "text"), ["s-a", "s-b", "s-c", "s-d"]
    )
    stats = idx.shard_term_stats(sharded)
    return idx.cori_shard_scores(stats, "dup batch small")


def q_mmr_rerank(spark, sf_dir):
    """MMR diversity re-rank (similarity.mmr_select, Carbonell &
    Goldstein SIGIR 1998): top-20 cosine candidates for probe vec 0,
    then 3 greedy λ=0.7 picks at the repo's 4-dp float32 cosine
    precision. The oracle unrolls all three greedy steps."""
    from spider_spark.operators import join_scalar_frame
    from spider_spark.operators.similarity import _cosine_expr, mmr_select

    emb = _t(spark, sf_dir, "embeddings")
    probe = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("probe_vec")
    )
    cands = (
        join_scalar_frame(emb.where(F.col("vec_id") >= 4), probe)
        .select(
            "vec_id",
            _cosine_expr("embedding", "probe_vec").alias("rel"),
            "embedding",
        )
        .orderBy(F.round(F.col("rel"), 4).desc(), F.col("vec_id").asc())
        .limit(20)
    )
    return mmr_select(cands, k=3, lam=0.7, round_dp=4)


def q_batch_bm25_topk(spark, sf_dir):
    """Whole-batch retrieval in one plan (index.batch_bm25_topk): three
    queries broadcast-joined against the impact table, one partial agg,
    one per-query rank window — the serving shape for query logs; a
    query-at-a-time loop pays a driver round-trip per query (the Amdahl
    term the search pipeline measured before this operator)."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [(1, "dup batch"), (2, "spark window merge"), (3, "vector group")],
        "query_id long, q string",
    )
    return idx.batch_bm25_topk(idx.bm25_scores(docs), queries, k=10)


def q_prf_search(spark, sf_dir):
    """Rocchio pseudo-relevance-feedback retrieval (index.bm25_search_prf,
    IIR §9.1): 'dup' (df≈5%) → top-5 feedback docs → 5 strongest
    co-occurring terms at β=0.4 → rescore, top-10. The whole two-pass
    chain restates in SQL."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    return idx.bm25_search_prf(docs, "dup", k=10, k_fb=5, n_expand=5, beta=0.4)


def q_term_drift_kl(spark, sf_dir):
    """Corpus drift alarm with attribution (textqc.term_drift_kl):
    smoothed KL(curr ‖ prev) between two snapshots — curr plants
    ' driftword' bursts on every 4th doc — total plus the top-20
    contributing terms, so the alarm says WHAT changed."""
    from spider_spark.operators import textqc

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    prev = docs.select(F.coalesce("text", F.lit("")).alias("text"))
    curr = docs.select(
        F.concat(
            F.coalesce("text", F.lit("")),
            F.when(d % 4 == 0, F.lit(" driftword driftword")).otherwise(F.lit("")),
        ).alias("text")
    )
    return textqc.term_drift_kl(prev, curr, top_contributors=20)


def q_frontier_eta(spark, sf_dir):
    """Politeness-aware frontier drain forecast (adaptive.frontier_eta):
    per-host ⌈pending/budget⌉ ticks — the critical-path view the
    politeness cap creates (the deepest host, not total volume, gates
    the makespan). Hosts h0..h4 carry an adaptive budget of 4, the rest
    the default 16."""
    from spider_spark.operators import adaptive

    docs = _t(spark, sf_dir, "documents")
    frontier = docs.select(
        F.concat(F.lit("h"), F.pmod(F.col("doc_id"), F.lit(25)).cast("string")).alias(
            "host"
        )
    )
    budgets = spark.createDataFrame(
        [(f"h{i}", 4) for i in range(5)], "host string, budget int"
    )
    return adaptive.frontier_eta(frontier, budgets, default_budget=16)


def q_zorder_locality(spark, sf_dir):
    """Z-order vs single-key layout audit (layout.zorder_locality_audit):
    the same (host_bucket, time_bucket) table written three ways, one
    rectangular query box — files touched per layout. Injective grid
    (a = doc_id%32, b = doc_id/32 %32) so the writer order is total and
    both engines assign identical files."""
    from spider_spark.operators import layout

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    grid = docs.select(
        F.pmod(d, F.lit(32)).cast("int").alias("host_bucket"),
        F.pmod(F.floor(d / 32), F.lit(32)).cast("int").alias("time_bucket"),
    )
    return layout.zorder_locality_audit(
        grid, "host_bucket", "time_bucket",
        rows_per_file=32, box_a=(0, 7), box_b=(0, 7), bits=5,
    )


def q_kcore_survivors(spark, sf_dir):
    """k-core peeling (graph.kcore_survivors, Seidman 1983) at k=3 over
    the synthetic link graph, 3 peel rounds — the link-farm-core lens
    next to spam_mass. Monotone peeling: the oracle unrolls the SAME 3
    rounds, so the frames agree even short of fixpoint."""
    from spider_spark.operators import graph

    docs = _t(spark, sf_dir, "documents")
    return graph.kcore_survivors(_link_edges(docs), k=3, rounds=3)


def q_dictionary_frontcoding(spark, sf_dir):
    """Term-dictionary front-coding size estimate
    (index.dictionary_frontcoding_stats, IIR §5.2): two-level bucketed
    sort (no global vocabulary sort), consecutive-term shared prefixes
    replaced by a length byte. The §5.2 dictionary half next to §5.3's
    postings vbyte estimator."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    return idx.dictionary_frontcoding_stats(docs, bucket_chars=2)


def q_boolean_search(spark, sf_dir):
    """Boolean retrieval (index.boolean_search, IIR ch.1): spark AND
    merge AND (window OR join) AND NOT dup — MUST as a partial-agg count
    equality (never a k-way self-join), SHOULD semi, NOT anti, all on
    doc_id."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    return idx.boolean_search(
        docs, must=["spark", "merge"], should=["window", "join"], must_not=["dup"]
    )


def q_more_like_this(spark, sf_dir):
    """Related documents by tf-idf cosine vs doc 0 (index.more_like_this,
    the Lucene MoreLikeThis discipline): source terms df-screened at 80%
    (the synthetic corpus vocabulary is deliberately common; the tighter
    production screen is pytest-pinned), full-vector norms, top-10. Oracle restates the whole weight/norm/dot
    chain."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    return idx.more_like_this(docs, 0, k=10, max_df_frac=0.8)


def q_term_proximity(spark, sf_dir):
    """Pairwise term-proximity re-rank signal (index.term_proximity,
    Büttcher et al. SIGIR 2006 core) for 'spark window merge': per doc
    the min position distance per term pair, prox = Σ 1/min_dist.
    Positional postings filtered to the query before any shuffle."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    return idx.term_proximity(docs, "spark window merge")


def q_textrank_keywords(spark, sf_dir):
    """Corpus keywords by TextRank (textqc.textrank_keywords, Mihalcea &
    Tarau EMNLP 2004): weighted PageRank over the adjacent-token
    co-occurrence graph, 2 sweeps; centrality beats raw frequency. The
    oracle unrolls the bigram census, the symmetric edge merge, and both
    weighted sweeps."""
    from spider_spark.operators import textqc

    docs = _t(spark, sf_dir, "documents")
    return textqc.textrank_keywords(docs, iters=2, min_len=2)


def q_rendezvous_shards(spark, sf_dir):
    """Rendezvous/HRW shard routing (layout.rendezvous_assign, Thaler &
    Ravishankar 1998): doc → argmax over 4 shards of the md5 score;
    adding a shard moves keys only onto it (pytest-pinned minimal
    movement). Map-only codegen; the oracle restates all four hashes and
    the ≥-cascade tie rule."""
    from spider_spark.operators import layout

    docs = _t(spark, sf_dir, "documents")
    return layout.rendezvous_assign(
        docs.select("doc_id"), ["s-a", "s-b", "s-c", "s-d"]
    )


def q_bm25f_search(spark, sf_dir):
    """BM25F body+anchor retrieval (index.bm25f_search, Robertson et al.
    CIKM 2004): anchors weighted 2× INSIDE the tf saturation (the
    paper's point), idf over any-field df. Anchor field synthesized
    arithmetically incl. null and empty anchors; oracle restates the
    whole two-field computation."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    anchored = docs.select(
        "doc_id",
        "text",
        F.when(d % 7 == 0, F.lit(None).cast("string"))
        .when(d % 5 == 0, F.lit("merge spark"))
        .when(d % 5 == 1, F.lit("spark window guide"))
        .otherwise(F.lit("misc anchor text"))
        .alias("anchor_text"),
    )
    return idx.bm25f_search(anchored, "spark window merge", k=10)


def q_spam_mass(spark, sf_dir):
    """Spam mass (graph.spam_mass, Gyöngyi et al. VLDB 2006): PageRank
    minus the trusted-core contribution (n·TrustRank, the linearity
    normalization), relative mass → 1 flags link-spam-suspect rank.
    Composes the two already-oracled rank chains; the oracle unrolls
    BOTH and joins them."""
    from spider_spark.operators import graph

    docs = _t(spark, sf_dir, "documents")
    seeds = docs.where(F.col("doc_id") % 50 == 0).select(F.col("doc_id").alias("node"))
    return graph.spam_mass(_link_edges(docs), seeds, iters=2)


def q_rrf_fusion(spark, sf_dir):
    """Reciprocal Rank Fusion (index.reciprocal_rank_fusion, Cormack et
    al. SIGIR 2009, k=60) over two independent deterministic top-25
    rankings — consensus docs outscore single-list docs; absent docs
    contribute nothing."""
    from spider_spark.operators import index as idx

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def ranked(mult: int, add: int):
        top = (
            docs.select("doc_id", F.pmod(d * mult + add, F.lit(997)).alias("s"))
            .orderBy(F.col("s").desc(), F.col("doc_id").asc())
            .limit(25)
        )
        w = Window.orderBy(F.col("s").desc(), F.col("doc_id").asc())
        return top.withColumn("rank", F.row_number().over(w)).select(
            "doc_id", "rank"
        )

    return idx.reciprocal_rank_fusion([ranked(13, 5), ranked(31, 2)], k=60)


def q_ucb_host_priority(spark, sf_dir):
    """UCB1 host scheduling (adaptive.ucb_host_priority, Auer et al.
    2002): mean discovery yield + exploration bonus per host; the
    never-fetched host carries explore=true with null scores. Host
    ledger synthesized arithmetically (host h7 never fetched)."""
    from spider_spark.operators import adaptive

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = F.concat(F.lit("h"), F.pmod(d, F.lit(30)).cast("string"))
    fetched = (F.pmod(d, F.lit(30)) != 7).cast("int")
    hy = docs.groupBy(host.alias("host")).agg(
        F.sum(fetched).alias("n_fetches"),
        F.sum(fetched * F.pmod(d, F.lit(11))).cast("double").alias("yield_sum"),
    )
    return adaptive.ucb_host_priority(hy)


def q_crawl_order_curve(spark, sf_dir):
    """Crawl-ordering quality curves (ordering.crawl_order_quality, Cho
    et al. 1998): value-blind BFS vs value-greedy tick assignment over
    the same URL set — per-(ordering, tick) cumulative value capture.
    The greedy curve must dominate at every interior tick (pytest);
    the oracle restates the tick census + cumulative windows."""
    from spider_spark.operators import ordering as od

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    base = docs.select(
        F.concat(F.lit("u"), d.cast("string")).alias("url"),
        F.pmod(d * 13, F.lit(100)).cast("double").alias("value"),
        d.alias("doc_id"),
    )
    led = base.select(
        F.lit("bfs").alias("ordering"),
        "url",
        F.pmod(F.col("doc_id"), F.lit(20)).cast("int").alias("tick"),
    ).unionByName(
        base.select(
            F.lit("greedy").alias("ordering"),
            "url",
            (F.lit(19) - F.floor(F.col("value") / 5)).cast("int").alias("tick"),
        )
    )
    return od.crawl_order_quality(
        led, base.select("url", "value"), ordering_col="ordering"
    )


def q_expected_freshness(spark, sf_dir):
    """Expected-freshness ledger (recrawl.expected_freshness, Cho &
    Garcia-Molina 2003): e^(−λ̂·age) per URL at a pinned evaluation
    instant (2024-03-01), λ̂ from the exact-µs change-rate estimator and
    age from each URL's latest capture. Composes change_rate ∘
    latest-capture — the recrawl scheduler's priority signal."""
    import datetime as _dt

    from spider_spark.operators import recrawl

    ev = _t(spark, sf_dir, "events")
    rates = recrawl.change_rate(
        ev, url_col="user_id", ts_col="ts", fp_col="event_type", tiebreak_col="event_id"
    )
    last = ev.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    return recrawl.expected_freshness(
        rates.join(last, "user_id"), _dt.datetime(2024, 3, 1), url_col="user_id"
    )


def q_maxscore_topk(spark, sf_dir):
    """MaxScore/WAND pruned top-10 (index.maxscore_topk, Turtle & Flood
    1995 / Broder et al. 2003) for 'dup batch' — a rare term (df≈5%)
    OR'd with a near-stopword, the workload the essential-term split
    exists for. The oracle is plain exact BM25 top-k: pruning must not
    change a single row (the WAND contract)."""
    from spider_spark.operators import index as idx

    return idx.maxscore_topk(_t(spark, sf_dir, "documents"), "dup batch", k=10)


def q_cdc_chunk_dedup(spark, sf_dir):
    """Content-defined-chunking delta-storage estimate
    (chunking.chunk_table → chunk_dedup_stats; LBFS window-hash CDC with
    FastCDC min/max clamps): documents' UTF-8 bytes chunked at
    content-local boundaries, corpus census of shared chunks. Rolling
    hash is not SQL-expressible → rows-only; the census arithmetic is
    oracle-anchored by the fixed_chunk_dedup sibling and the chunker
    itself is differentially tested against a naive per-byte reference
    (tests/test_chunking.py)."""
    from spider_spark.operators import chunking as ck

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("content")
    )
    chunks = ck.chunk_table(
        docs, "content", "doc_id", mask_bits=6, min_size=32, max_size=512
    )
    return ck.chunk_dedup_stats(chunks)


def q_fixed_chunk_dedup(spark, sf_dir):
    """Fixed-size 64-char chunk census (chunking.fixed_chunk_stats) —
    the pure-Catalyst baseline CDC is measured against (and the
    engine-portable oracle anchor for the census arithmetic: md5 over
    character substrings restates verbatim in DuckDB)."""
    from spider_spark.operators import chunking as ck

    docs = _t(spark, sf_dir, "documents")
    return ck.fixed_chunk_stats(docs, "text", chunk_chars=64)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # oracle-backed (SQL-expressible semantics)
        "politeness_topk_per_host": q_politeness_topk,
        "url_seen_anti_join": q_seen_anti_join,
        "keep_first_dedupe": q_keep_first_dedupe,
        "link_filter_include_exclude": q_link_filter,
        "detector_first_match": q_detector_first_match,
        "doc_extension_filter": q_doc_extension_filter,
        "exact_dedupe_stats": q_exact_dedupe_stats,
        "cache_key": q_cache_key,
        "host_shard_distribution": q_host_shard,
        "metrics_rollup_q1": q_metrics_rollup,
        "orders_per_nation": q_orders_per_nation,
        "events_hourly_rollup": q_events_hourly,
        "token_counts": q_token_counts,
        "quality_flags": q_quality_flags,
        "lang_id": q_lang_id,
        "declared_lang_mismatch": q_declared_lang_mismatch,
        "similarity_topk_cosine": q_similarity_topk,
        "scrape_document_text_branch": q_scrape_document,
        "scrape_document_download_branch": q_scrape_document_downloads,
        "platform_detect": q_platform_detect,
        "robots_parse": q_robots_parse,
        "platform_fetch_items": q_platform_fetch_items,
        "tree_scrape_metrics": q_tree_scrape_metrics,
        "multimodal_ppm_decode": q_ppm_decode,
        "multimodal_png_decode": q_png_decode,
        "multimodal_gif_decode": q_gif_decode,
        "multimodal_jpeg_decode": q_jpeg_decode,
        "video_frame_sample_gif": q_gif_video_frames,
        "video_container_meta": q_video_container_meta,
        "audio_wav_features": q_wav_features,
        "feed_extract": q_feed_extract,
        "feed_discovery": q_feed_discovery,
        "cache_read_through_misses": q_cache_read_through,
        "find_document_links": q_find_document_links,
        "ngram_jaccard_pairs": q_ngram_jaccard,
        "dup_ngram_coverage": q_dup_ngram_coverage,
        "remove_dup_spans": q_remove_dup_spans,
        "bff_paragraph_dedupe": q_bff_paragraph_dedupe,
        "main_content_extract": q_main_content,
        "wat_extract": q_wat_extract,
        "wet_roundtrip": q_wet_roundtrip,
        "bpe_tokenize": q_bpe_tokenize,
        "bpe_encode_fixed_merges": q_bpe_encode_fixed_merges,
        "gpt2_bpe_encode_fixed": q_gpt2_bpe_encode_fixed,
        "simhash_deterministic": q_simhash_md5,
        "minhash_deterministic": q_minhash_md5,
        "minhash_incremental_probe": q_minhash_incremental_probe,
        "fuzzy_decontaminate": q_fuzzy_decontaminate,
        "winnowing_deterministic": q_winnowing_md5,
        "ivf_topk_ann": q_ivf_topk,
        "repetition_signals": q_repetition_signals,
        "boilerplate_ngrams": q_boilerplate_ngrams,
        "warc_roundtrip": q_warc_roundtrip,
        "sitemap_extract": q_sitemap_extract,
        "robots_sitemaps": q_robots_sitemaps,
        "cdx_surt_index": q_cdx_index,
        "cdx_lookup_latest": q_cdx_lookup,
        "warc_revisit_plan": q_revisit_plan,
        "dup_clusters": q_dup_clusters,
        "pagerank_2iter": q_pagerank,
        "clean_corpus": q_clean_corpus,
        "strip_tracking_params": q_strip_tracking,
        "decontaminate_benchmark_overlap": q_decontaminate,
        "recrawl_change_rate": q_change_rate,
        "retry_backoff_plan": q_retry_backoff,
        "content_seen_report": q_content_seen,
        "triangle_stats": q_triangle_stats,
        "harmonic_centrality_2hop": q_harmonic_2hop,
        "hyperball_centrality": q_hyperball,
        "cocitation_pairs": q_cocitation,
        "phrase_search": q_phrase_search,
        "query_snippets": q_query_snippets,
        "term_suggestions": q_term_suggestions,
        "bm25_search_collapsed": q_bm25_search_collapsed,
        "postings_vbyte_stats": q_postings_vbyte_stats,
        "elias_fano_stats": q_elias_fano_stats,
        "weighted_sample_per_source": q_weighted_sample_per_source,
        "bm25_maxp_search": q_bm25_maxp_search,
        "leakage_safe_splits": q_leakage_safe_splits,
        "lang_mixture": q_lang_mixture,
        "salsa_2sweep": q_salsa,
        "heaps_fit": q_heaps_fit,
        "vocab_richness": q_vocab_richness,
        "allocation_fairness": q_allocation_fairness,
        "ranking_agreement": q_ranking_agreement,
        "comb_fusion": q_comb_fusion,
        "ai_optout_screen": q_ai_optout_screen,
        "section_chunks": q_section_chunks,
        "unigram_tokenize": q_unigram_tokenize,
        "reshard_move_stats": q_reshard_move_stats,
        "temperature_mixture": q_temperature_mixture,
        "parked_screen": q_parked_screen,
        "symspell_suggestions": q_symspell_suggestions,
        "jsonld_entities": q_jsonld_entities,
        "pagination_chains": q_pagination_chains,
        "rbp_err_eval": q_rbp_err_eval,
        "ai_crawler_policy": q_ai_crawler_policy,
        "compression_ratio": q_compression_ratio,
        "watermark_lateness": q_watermark_lateness,
        "title_consistency": q_title_consistency,
        "amp_variant_pairs": q_amp_variant_pairs,
        "bowtie_classes": q_bowtie_classes,
        "pca_project": q_pca_project,
        "credit_card_signals": q_credit_card_signals,
        "cross_source_dups": q_cross_source_dups,
        "char_entropy": q_char_entropy,
        "og_properties": q_og_properties,
        "html_tables": q_html_tables,
        "team_draft_interleave": q_team_draft_interleave,
        "robots_policy_diff": q_robots_policy_diff,
        "sitemap_coverage": q_sitemap_coverage,
        "host_url_space_estimate": q_host_url_space_estimate,
        "trending_event_types": q_trending_event_types,
        "percolate_alerts": q_percolate_alerts,
        "quantize_embeddings_int8": q_quantize_embeddings_int8,
        "hreflang_reciprocity": q_hreflang_reciprocity,
        "politeness_compliance": q_politeness_compliance,
        "readability_flesch": q_readability_flesch,
        "collocations_pmi": q_collocations_pmi,
        "dhash_near_dups": q_dhash_near_dups,
        "dhash_hot_band_census": q_dhash_hot_band_census,
        "zipf_fit": q_zipf_fit,
        "lpa_communities_2sweep": q_lpa_communities,
        "sitemap_urlsets": q_sitemap_write,
        "session_stats_30min": q_session_stats,
        "http_freshness": q_http_freshness,
        "split_assign_deterministic": q_split_assign,
        "stratified_hash_sample": q_stratified_sample,
        "per_source_quota_topk": q_source_quota,
        "perplexity_buckets": q_perplexity_buckets,
        "stupid_backoff_ppl": q_stupid_backoff_ppl,
        "kneser_ney_ppl": q_kneser_ney_ppl,
        "charset_decode": q_charset_decode,
        "host_reputation": q_host_reputation,
        "anchor_text_rollup": q_anchor_text,
        "semdedup_clusters": q_semdedup,
        "prototype_prune": q_prototype_prune,
        "retrieval_eval_ndcg": q_retrieval_eval,
        "ip_politeness_topk": q_ip_politeness,
        "layout_scan_locality": q_layout_locality,
        "token_mixture_plan": q_token_mixture,
        "mixture_materialize": q_mixture_materialize,
        "meta_robots_directives": q_meta_robots,
        "priority_aging_selection": q_priority_aging,
        "adaptive_host_budgets": q_adaptive_budgets,
        "quality_classifier_score": q_quality_classifier,
        "dsir_importance_weights": q_dsir_weights,
        "url_trap_guard": q_trap_guard,
        "heavy_hitter_hosts": q_heavy_hitter_hosts,
        "cms_host_counts": q_cms_host_counts,
        "fixed_chunk_dedup": q_fixed_chunk_dedup,
        "maxscore_topk": q_maxscore_topk,
        "crawl_order_curve": q_crawl_order_curve,
        "expected_freshness": q_expected_freshness,
        "spam_mass_2iter": q_spam_mass,
        "bm25f_search": q_bm25f_search,
        "rendezvous_shards": q_rendezvous_shards,
        "term_proximity_rerank": q_term_proximity,
        "textrank_keywords": q_textrank_keywords,
        "boolean_search": q_boolean_search,
        "more_like_this": q_more_like_this,
        "fixed_capture_delta": q_fixed_capture_delta,
        "kcore_survivors": q_kcore_survivors,
        "zorder_locality": q_zorder_locality,
        "term_drift_kl": q_term_drift_kl,
        "frontier_eta": q_frontier_eta,
        "prf_search": q_prf_search,
        "batch_bm25_topk": q_batch_bm25_topk,
        "mmr_rerank": q_mmr_rerank,
        "cori_shard_select": q_cori_shard_select,
        "pruned_postings": q_pruned_postings,
        "query_clarity": q_query_clarity,
        "ql_dirichlet_topk": q_ql_dirichlet,
        "tokenizer_fertility": q_tokenizer_fertility,
        "revisit_priority": q_revisit_priority,
        "dictionary_frontcoding": q_dictionary_frontcoding,
        "rrf_fusion": q_rrf_fusion,
        "ucb_host_priority": q_ucb_host_priority,
        "line_dedup_c4": q_line_dedup,
        "embedding_near_dups_exact": q_embedding_near_dups_exact,
        "lsh_recall": q_lsh_recall,
        "pii_redact": q_pii_redact,
        "sitemap_revalidation": q_sitemap_revalidation,
        "gopher_quality": q_gopher_quality,
        "c4_line_filters": q_c4_line_filters,
        "url_prefetch_filters": q_url_filters,
        "sequence_pack_chunks": q_sequence_pack,
        "sequence_pack_stats": q_sequence_pack_stats,
        "shard_manifest": q_shard_manifest,
        "unicode_nfc": q_unicode_nfc,
        "mojibake_repair": q_mojibake_repair,
        "nb_langid_train_score": q_nb_langid,
        "corpus_datacard": q_corpus_datacard,
        "mirror_hosts": q_mirror_hosts,
        "soft404_screen": q_soft404_screen,
        "snapshot_diff": q_snapshot_diff,
        "url_alias_clusters": q_url_alias_clusters,
        "registered_domain_rollup": q_registered_domains,
        "opic_2sweep": q_opic,
        "tfidf_top_terms": q_tfidf_top_terms,
        "hits_2iter": q_hits,
        "trustrank_2iter": q_trustrank,
        "crawl_depth_bfs": q_bfs_depth,
        "bm25_search": q_bm25_search,
        "focused_relevance": q_focused_relevance,
        "host_pagerank_2iter": q_host_pagerank,
        "dust_param_rules": q_dust_rules,
        "dust_strip": q_dust_strip,
        "reciprocal_links": q_reciprocal_links,
        "outlink_farms": q_outlink_farms,
        "template_shapes": q_template_shapes,
        "url_path_dates": q_url_path_dates,
        "markup_density": q_markup_density,
        "idn_host_audit": q_idn_host_audit,
        "code_fraction": q_code_fraction,
        "outlink_novelty": q_outlink_novelty,
        "sniff_content_type": q_sniff_content_type,
        "publish_date_fusion": q_publish_date_fusion,
        "truncation_recall": q_truncation_recall,
        "path_template_census": q_path_template_census,
        "postings_delta_merge": q_postings_merge,
        "degree_histogram_in": q_degree_histogram,
        "kmeans_codebook": q_kmeans_codebook,
        "ngram_containment_pairs": q_ngram_containment,
        "contracted_link_graph": q_contract_edges,
        # rows-only (custom distributed operators)
        "pack_bins_ffd": q_pack_bins_ffd,
        "crawl_tick": q_crawl_tick,
        "cdc_chunk_dedup": q_cdc_chunk_dedup,
        "capture_delta": q_capture_delta,
        "minhash_near_dups": q_minhash_near_dups,
        "simhash_near_dups": q_simhash_near_dups,
        "embedding_near_dups": q_embedding_near_dups,
        "lsh_topk_ann": q_lsh_topk,
        "multimodal_image_features": q_multimodal_features,
        "video_frame_sample": q_video_frames,
        "winnowing_fingerprints": q_winnowing,
    }


def oracle_sql() -> dict[str, str]:
    from spider_spark.operators.curation import PII_PATTERNS as _PII
    from spider_spark.operators.domains import MULTI_LABEL_SUFFIXES as _MLS

    stop_list = _sql_list(_STOP_EN)
    return {
        "politeness_topk_per_host": """
            SELECT o_custkey, o_orderkey, rk FROM (
              SELECT o_custkey, o_orderkey,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS rk
              FROM orders) WHERE rk <= 3
        """,
        "url_seen_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "keep_first_dedupe": """
            SELECT user_id, event_type, event_id AS first_event_id FROM (
              SELECT user_id, event_type, event_id,
                     ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id) AS rn
              FROM events) WHERE rn = 1
        """,
        "link_filter_include_exclude": """
            SELECT doc_id, source, lang FROM documents
            WHERE source IS NOT NULL AND source <> ''
              AND (lower(source) LIKE '%src1%' OR lower(text) LIKE '%window%')
              AND NOT (lower(source) LIKE '%slow%' OR lower(text) LIKE '%slow%')
        """,
        "detector_first_match": """
            SELECT doc_id, matched,
                   CASE WHEN d1 <> '' THEN 'wordpress-pdf-link'
                        WHEN d2 <> '' THEN 'civicweb-pdf-link'
                        WHEN d3 <> '' THEN 'docushare-doc-link' END AS strategy
            FROM (
              SELECT doc_id,
                     regexp_extract(text, 'agg ([a-z]+)', 1) AS d1,
                     regexp_extract(text, 'window ([a-z]+)', 1) AS d2,
                     regexp_extract(text, 'join ([a-z]+)', 1) AS d3,
                     COALESCE(NULLIF(regexp_extract(text, 'agg ([a-z]+)', 1), ''),
                              NULLIF(regexp_extract(text, 'window ([a-z]+)', 1), ''),
                              NULLIF(regexp_extract(text, 'join ([a-z]+)', 1), '')) AS matched
              FROM documents)
            WHERE matched IS NOT NULL
        """,
        "doc_extension_filter": """
            WITH named AS (
              SELECT p_partkey,
                     'file_' || p_partkey ||
                     CASE p_partkey % 9
                       WHEN 0 THEN '.pdf' WHEN 1 THEN '.doc' WHEN 2 THEN '.docx'
                       WHEN 3 THEN '.txt' WHEN 4 THEN '.md' WHEN 5 THEN '.rtf'
                       WHEN 6 THEN '.html' WHEN 7 THEN '.zip' ELSE '.png'
                     END AS filename
              FROM part)
            SELECT p_partkey, filename,
                   CASE WHEN filename LIKE '%.pdf' THEN 'application/pdf'
                        WHEN filename LIKE '%.doc' THEN 'application/msword'
                        WHEN filename LIKE '%.docx' THEN 'application/vnd.openxmlformats-officedocument.wordprocessingml.document'
                        WHEN filename LIKE '%.txt' THEN 'text/plain'
                        WHEN filename LIKE '%.md' THEN 'application/octet-stream'
                        WHEN filename LIKE '%.rtf' THEN 'application/rtf'
                   END AS content_type
            FROM named
            WHERE lower(filename) LIKE '%.pdf' OR lower(filename) LIKE '%.doc'
               OR lower(filename) LIKE '%.docx' OR lower(filename) LIKE '%.txt'
               OR lower(filename) LIKE '%.md' OR lower(filename) LIKE '%.rtf'
        """,
        "exact_dedupe_stats": """
            SELECT count(*) AS n_total,
                   count(DISTINCT sha256(text)) AS n_unique,
                   count(*) - count(DISTINCT sha256(text)) AS n_dup_rows
            FROM documents
        """,
        "cache_key": """
            SELECT doc_id,
                   'doc:' || sha256('{"parts":[],"url":"https://docs.test/' || doc_id || '"}') AS cache_key
            FROM documents
        """,
        "host_shard_distribution": """
            SELECT substr(md5('https://docs.test/' || doc_id), 1, 1) AS shard,
                   count(*) AS n
            FROM documents GROUP BY 1
        """,
        "metrics_rollup_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price,
                   CAST(SUM(CAST(l_discount AS DECIMAL(25,2))) AS DOUBLE) AS sum_disc,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "orders_per_nation": """
            SELECT n_name, count(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total_price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "events_hourly_rollup": """
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   event_type, count(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "token_counts": """
            SELECT doc_id,
                   len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+')) AS n_bpe
            FROM documents
        """,
        "quality_flags": f"""
            SELECT doc_id, n_tokens,
                   (n_tokens >= 20 AND n_tokens <= 100000) AS length_ok,
                   (len(list_filter(toks, x -> list_contains({stop_list}, lower(x)))) > 0) AS has_stopwords,
                   CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS INT) AS punct_count
            FROM (
              SELECT doc_id, text,
                     list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks,
                     len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS n_tokens
              FROM documents)
        """,
        "lang_id": _lang_id_oracle(),
        # declared derived from the construction; detected = the lang_id
        # oracle expression re-used verbatim
        "declared_lang_mismatch": f"""
            WITH det AS (SELECT doc_id, lang_pred FROM ({_lang_id_oracle()})),
            d AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN NULL
                          ELSE ['en','de','fr','es','zh'][doc_id % 5 + 1]
                     END AS declared_lang
              FROM documents)
            SELECT d.doc_id AS id, d.declared_lang,
                   det.lang_pred AS detected_lang,
                   COALESCE(d.declared_lang IS NOT NULL
                            AND det.lang_pred <> 'und'
                            AND d.declared_lang <> det.lang_pred,
                            FALSE) AS mismatch
            FROM d JOIN det USING (doc_id)
        """,
        "scrape_document_text_branch": """
            SELECT doc_id,
                   'Doc ' || doc_id AS title,
                   'Doc ' || doc_id ||
                     CASE WHEN trim(text) = '' THEN ''
                          ELSE ' ' || trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')) END AS text,
                   'basic' AS strategy,
                   TRUE AS complete
            FROM documents
        """,
        "scrape_document_download_branch": """
            SELECT doc_id,
                   'https://cdn.test/f' || doc_id ||
                     CASE WHEN doc_id % 3 = 2 THEN '.xlsx' ELSE '.pdf' END AS doc_url,
                   CASE WHEN doc_id % 3 = 2
                        THEN 'application/vnd.openxmlformats-officedocument.spreadsheetml.sheet'
                        ELSE 'application/pdf' END AS type,
                   'f' || doc_id ||
                     CASE WHEN doc_id % 3 = 2 THEN '.xlsx' ELSE '.pdf' END AS title,
                   (doc_id % 3 <> 2) AS is_pdf,
                   TRUE AS is_download,
                   (doc_id % 3 <> 1) AS complete,
                   'direct-download' AS strategy,
                   CASE WHEN doc_id % 3 = 1 THEN sha256('')
                        ELSE sha256('bytes-' || doc_id) END AS content_sha
            FROM documents
        """,
        "robots_parse": """
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'spiderbot' ELSE '*' END AS matched_ua,
                   1 AS n_disallow,
                   CASE WHEN doc_id % 3 = 0
                        THEN '/only/' || (doc_id % 5) || '/'
                        ELSE '/private/' || (doc_id % 7) || '/' END AS first_disallow,
                   CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS n_allow,
                   CASE WHEN doc_id % 3 = 0 THEN 2000
                        ELSE ((doc_id % 4) + 1) * 1000 END AS crawl_delay_ms
            FROM documents
        """,
        "platform_detect": """
            SELECT doc_id,
                   CASE doc_id % 5
                     WHEN 0 THEN 'wordpress-download-manager'
                     WHEN 1 THEN 'civicweb'
                     WHEN 2 THEN 'docushare'
                     WHEN 3 THEN 'wordpress-download-manager'
                     ELSE 'generic' END AS detected_type,
                   CASE doc_id % 5
                     WHEN 3 THEN 'medium'
                     WHEN 4 THEN 'low'
                     ELSE 'high' END AS detected_confidence
            FROM documents
        """,
        "multimodal_ppm_decode": """
            SELECT i AS media_id,
                   CAST(16 + i % 17 AS INT) AS width,
                   CAST(12 + (i * 3) % 13 AS INT) AS height,
                   ROUND((list_sum(list_transform(
                        generate_series(0, CAST(16 + i % 17 AS INT) - 1),
                        x -> x * 255 // (16 + i % 17 - 1)))
                      / CAST(16 + i % 17 AS DOUBLE)) / 255.0, 3) AS red_mean
            FROM generate_series(0, 63) t(i)
        """,
        "multimodal_png_decode": """
            SELECT i AS media_id,
                   CAST(16 + i % 17 AS INT) AS width,
                   CAST(12 + (i * 3) % 13 AS INT) AS height,
                   ROUND((list_sum(list_transform(
                        generate_series(0, CAST(16 + i % 17 AS INT) - 1),
                        x -> x * 255 // (16 + i % 17 - 1)))
                      / CAST(16 + i % 17 AS DOUBLE)) / 255.0, 3) AS red_mean,
                   ROUND((i % 256) / 255.0, 4) AS blue_mean
            FROM generate_series(0, 79) t(i)
        """,
        "multimodal_gif_decode": """
            SELECT i AS media_id,
                   CAST(16 + i % 17 AS INT) AS width,
                   CAST(12 + (i * 3) % 13 AS INT) AS height,
                   ROUND((list_sum(list_transform(
                        generate_series(0, CAST(16 + i % 17 AS INT) - 1),
                        x -> x * 255 // (16 + i % 17 - 1)))
                      / CAST(16 + i % 17 AS DOUBLE)) / 255.0, 3) AS red_mean,
                   ROUND((i % 256) / 255.0, 4) AS blue_mean
            FROM generate_series(0, 63) t(i)
        """,
        "multimodal_jpeg_decode": """
            SELECT i AS media_id,
                   CAST(16 + i % 17 AS INT) AS width,
                   CAST(12 + (i * 3) % 13 AS INT) AS height,
                   CAST((i * 37) % 256 AS INT) AS mean_r,
                   CAST((i * 59) % 256 AS INT) AS mean_g,
                   CAST((i * 83) % 256 AS INT) AS mean_b
            FROM generate_series(0, 63) t(i)
        """,
        "video_frame_sample_gif": """
            WITH sampled AS (
                SELECT i, fi,
                       LEAST(fi * (3 + i % 4) // 3, (3 + i % 4) - 1) AS f
                FROM generate_series(0, 31) t(i)
                CROSS JOIN generate_series(0, 2) s(fi)
            )
            SELECT i AS media_id,
                   CAST(fi AS INT) AS frame_idx,
                   CAST(24 + i % 9 AS INT) AS width,
                   CAST(18 + (i * 5) % 7 AS INT) AS height,
                   CAST((i * 37 + f * 49) % 256 AS INT) AS mean_r,
                   CAST((f * 61) % 256 AS INT) AS mean_g,
                   CAST((i + f * 13) % 256 AS INT) AS mean_b
            FROM sampled
        """,
        "feed_extract": """
            SELECT 'https://ex.test/feed/' || doc_id AS url,
                   CASE WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END AS feed_kind,
                   CAST(0 AS INT) AS pos,
                   CASE WHEN doc_id % 2 = 0
                        THEN 'Post & co #' || doc_id
                        ELSE 'Entry ' || doc_id END AS title,
                   CASE WHEN doc_id % 2 = 0
                        THEN 'https://ex.test/p/' || doc_id || '?a=1&b=2'
                        ELSE 'https://ex.test/a/' || doc_id END AS link,
                   CASE WHEN doc_id % 2 = 0
                        THEN 'tag:ex,' || doc_id
                        ELSE 'urn:' || doc_id END AS guid,
                   CASE WHEN doc_id % 2 = 0
                        THEN '2006-01-02 15:04:0' || (doc_id % 10)
                        ELSE '2021-07-1' || (doc_id % 9 + 1) || ' 08:09:10' END AS published
            FROM documents
        """,
        "feed_discovery": """
            SELECT 'https://h' || (doc_id % 7) || '.test/page/' || doc_id AS page_url,
                   CASE WHEN doc_id % 2 = 0
                        THEN 'https://h' || (doc_id % 7) || '.test/rss/' || doc_id
                        ELSE 'https://h' || (doc_id % 7) || '.test/atom/' || doc_id
                   END AS feed_url,
                   CASE WHEN doc_id % 2 = 0
                        THEN 'application/rss+xml'
                        ELSE 'application/atom+xml' END AS feed_type
            FROM documents
        """,
        "video_container_meta": """
            SELECT i AS media_id,
                   'isom' AS brand,
                   CAST(1000 + (i * 137) % 9000 AS INT) AS duration_ms,
                   CAST(1 + i % 3 AS INT) AS n_tracks,
                   CAST(320 + (i % 8) * 80 AS INT) AS width,
                   CAST(180 + (i % 8) * 45 AS INT) AS height
            FROM generate_series(0, 31) t(i)
        """,
        "audio_wav_features": """
            SELECT i AS media_id,
                   CAST(250 AS INT) AS duration_ms,
                   CAST(200 + (i % 40) * 50 AS INT) AS dominant_hz_bin
            FROM generate_series(0, 47) t(i)
        """,
        "tree_scrape_metrics": """
            SELECT doc_id,
                   CAST(CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 1 ELSE 0 END AS INT) AS interaction_count,
                   CASE WHEN doc_id % 4 = 3 THEN 0.5 ELSE 0.9 END AS confidence,
                   CASE doc_id % 4
                     WHEN 0 THEN '.accordion-button'
                     WHEN 1 THEN 'details summary'
                     WHEN 2 THEN 'button[aria-expanded]'
                   END AS matched_selector,
                   CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 1 ELSE 0 END AS INT) AS link_count
            FROM documents
        """,
        "platform_fetch_items": """
            SELECT 'https://a.test/download/d' || doc_id AS url,
                   'wordpress-download-manager' AS detected_type,
                   CAST(0 AS INT) AS item_pos,
                   'https://a.test/dl/f' || doc_id || '.pdf?wpdmdl=' || doc_id AS item_url,
                   'Get' AS item_text
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT 'https://b.civicweb.net/filepro/documents/?preview=' || doc_id,
                   'civicweb', CAST(0 AS INT),
                   'https://b.civicweb.net/filepro/document/' || doc_id || '/Agenda%20' || doc_id || '.pdf',
                   'Agenda'
            FROM documents WHERE doc_id % 3 = 1
            UNION ALL
            SELECT 'https://c.test/docushare/dsweb/Get/Document-' || doc_id,
                   'docushare', CAST(0 AS INT),
                   'https://c.test/dsweb/Get/Document-' || doc_id || '/Min%20' || doc_id || '.xlsx',
                   'M'
            FROM documents WHERE doc_id % 3 = 2
        """,
        "cache_read_through_misses": """
            SELECT doc_id, 'https://docs.test/' || doc_id AS url_canon
            FROM documents WHERE doc_id % 3 <> 0
        """,
        "find_document_links": """
            SELECT 'https://docs.test/d/' || doc_id AS url,
                   'https://docs.test/files/a' || doc_id || '.pdf' AS href
            FROM documents
            UNION ALL
            SELECT 'https://docs.test/d/' || doc_id AS url,
                   'https://docs.test/d/rel' || doc_id || '.txt' AS href
            FROM documents
        """,
        "ngram_jaccard_pairs": """
            WITH g AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(t) - 2, 1)),
                       i -> array_to_string(t[i:i+2], ' '))) AS grams
              FROM (SELECT doc_id,
                           string_split_regex(lower(trim(text)), '\\s+') AS t
                    FROM documents))
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   ROUND(CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0
                              THEN CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                                   / len(list_distinct(list_concat(a.grams, b.grams)))
                              ELSE 0 END, 4) AS jaccard_r
            FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
            WHERE a.doc_id % 10 = 0
        """,
        "dup_ngram_coverage": """
            WITH tt AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 x -> x <> '') AS toks
              FROM documents),
            g AS (
              SELECT doc_id, i - 1 AS pos,
                     array_to_string(toks[i:i+4], ' ') AS gram
              FROM tt, UNNEST(generate_series(1, greatest(len(toks) - 4, 0))) AS u(i)),
            census AS (
              SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
            starts AS (
              SELECT g.doc_id, g.pos FROM g JOIN census USING (gram)),
            cov AS (
              SELECT doc_id, CAST(COUNT(*) AS INT) AS covered_tokens FROM (
                SELECT DISTINCT s.doc_id, s.pos + o AS tp
                FROM starts s, UNNEST(generate_series(0, 4)) AS v(o))
              GROUP BY doc_id),
            ds AS (
              SELECT doc_id, CAST(COUNT(*) AS INT) AS dup_gram_starts
              FROM starts GROUP BY doc_id)
            SELECT tt.doc_id AS id,
                   CAST(len(toks) AS INT) AS n_tokens,
                   CAST(greatest(len(toks) - 4, 0) AS INT) AS n_grams,
                   COALESCE(ds.dup_gram_starts, 0) AS dup_gram_starts,
                   COALESCE(cov.covered_tokens, 0) AS covered_tokens,
                   ROUND(CASE WHEN len(toks) > 0
                              THEN CAST(COALESCE(cov.covered_tokens, 0) AS DOUBLE) / len(toks)
                              ELSE 0 END, 4) AS dup_coverage
            FROM tt LEFT JOIN ds USING (doc_id) LEFT JOIN cov USING (doc_id)
        """,
        "main_content_extract": """
            WITH tt AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
              FROM documents),
            d AS (
              SELECT doc_id,
                     CAST(doc_id % 7 AS INT) AS w2,
                     CAST(len(toks) - doc_id % 7 AS INT) AS w1,
                     array_to_string(toks[1 : len(toks) - CAST(doc_id % 7 AS INT)], ' ') AS h1,
                     CASE WHEN doc_id % 7 > 0
                          THEN array_to_string(
                                 toks[len(toks) - CAST(doc_id % 7 AS INT) + 1 : len(toks)], ' ')
                          ELSE '' END AS h2
              FROM tt),
            cls AS (SELECT *, (w1 >= 5) AS g1, (w2 >= 5) AS g2 FROM d),
            fin AS (
              SELECT *,
                     (w1 > 0) AND (g1 OR (w1 >= 3 AND g2)) AS f1,
                     (w2 > 0) AND (g2 OR (w2 >= 3 AND g1)) AS f2
              FROM cls)
            SELECT doc_id AS id,
                   CAST(2 + (CASE WHEN w1 > 0 THEN 1 ELSE 0 END)
                          + (CASE WHEN w2 > 0 THEN 1 ELSE 0 END) AS INT) AS n_blocks,
                   CAST((CASE WHEN f1 THEN 1 ELSE 0 END)
                      + (CASE WHEN f2 THEN 1 ELSE 0 END) AS INT) AS n_good,
                   CAST((CASE WHEN f1 THEN strlen(h1) ELSE 0 END)
                      + (CASE WHEN f2 THEN strlen(h2) ELSE 0 END) AS INT) AS main_chars,
                   md5(CASE WHEN f1 AND f2 THEN h1 || chr(10) || h2
                            WHEN f1 THEN h1
                            WHEN f2 THEN h2
                            ELSE '' END) AS main_md5
            FROM fin
        """,
        "wat_extract": """
            SELECT 'https://wat.test/d/' || doc_id AS url,
                   'Doc ' || doc_id || ' "q"' AS title,
                   CAST(doc_id % 4 + 1 AS INT) AS n_links,
                   array_to_string(
                       list_transform(range(doc_id % 4 + 1),
                                      i -> 'https://wat.test/l/' || i),
                       '|') AS links_joined
            FROM documents
            ORDER BY url
        """,
        "wet_roundtrip": """
            SELECT 'https://wet.test/doc/' || doc_id AS url,
                   CAST(strlen(text || chr(10) || 'WARC/1.0' || chr(13) || chr(10)
                        || 'Content-Length: 999' || chr(13) || chr(10)
                        || chr(13) || chr(10) || 'not a record') AS BIGINT) AS n_chars,
                   md5(text || chr(10) || 'WARC/1.0' || chr(13) || chr(10)
                        || 'Content-Length: 999' || chr(13) || chr(10)
                        || chr(13) || chr(10) || 'not a record') AS text_md5
            FROM documents
        """,
        "remove_dup_spans": """
            WITH tt AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 x -> x <> '') AS toks
              FROM documents),
            g AS (
              SELECT doc_id, i - 1 AS pos,
                     array_to_string(toks[i:i+4], ' ') AS gram
              FROM tt, UNNEST(generate_series(1, greatest(len(toks) - 4, 0))) AS u(i)),
            flagged AS (
              SELECT gram, min(doc_id) AS owner
              FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
            removable AS (
              SELECT g.doc_id, g.pos FROM g JOIN flagged f USING (gram)
              WHERE g.doc_id <> f.owner),
            covered AS (
              SELECT DISTINCT doc_id, pos + o AS p
              FROM removable, UNNEST(generate_series(0, 4)) AS v(o)),
            tok AS (
              SELECT doc_id, i - 1 AS p, toks[i] AS tok
              FROM tt, UNNEST(generate_series(1, len(toks))) AS w(i)),
            kept AS (
              SELECT t.doc_id, t.p, t.tok
              FROM tok t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
              WHERE c.doc_id IS NULL),
            assembled AS (
              SELECT doc_id, CAST(COUNT(*) AS INT) AS kept_tokens,
                     string_agg(tok, ' ' ORDER BY p) AS clean_text
              FROM kept GROUP BY doc_id)
            SELECT tt.doc_id AS id,
                   CAST(len(toks) AS INT) AS n_tokens,
                   CAST(len(toks) - COALESCE(a.kept_tokens, 0) AS INT) AS removed_tokens,
                   md5(COALESCE(a.clean_text, '')) AS clean_md5
            FROM tt LEFT JOIN assembled a USING (doc_id)
        """,
        "bff_paragraph_dedupe": """
            WITH reflow AS (
              SELECT doc_id,
                     regexp_replace(text, '((\\S+ ){2}\\S+) ', '\\1' || chr(10), 'g') AS t
              FROM documents),
            lines AS (
              SELECT doc_id,
                     unnest(string_split(t, chr(10))) AS para,
                     unnest(range(1, len(string_split(t, chr(10))) + 1)) AS pos
              FROM reflow),
            nz AS (
              SELECT doc_id, pos, para,
                     lower(trim(regexp_replace(para, '\\s+', ' ', 'g'))) AS norm
              FROM lines
              WHERE lower(trim(regexp_replace(para, '\\s+', ' ', 'g'))) <> ''),
            ranked AS (
              SELECT doc_id, pos, para,
                     row_number() OVER (PARTITION BY norm ORDER BY doc_id, pos) AS rn
              FROM nz),
            kept AS (SELECT doc_id, pos, para FROM ranked WHERE rn = 1),
            assembled AS (
              SELECT doc_id, CAST(COUNT(*) AS INT) AS n_kept,
                     string_agg(para, chr(10) ORDER BY pos) AS clean_text
              FROM kept GROUP BY doc_id),
            totals AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_paras FROM nz GROUP BY doc_id)
            SELECT t.doc_id AS id, t.n_paras,
                   CAST(t.n_paras - COALESCE(a.n_kept, 0) AS INT) AS n_removed,
                   md5(COALESCE(a.clean_text, '')) AS clean_md5
            FROM totals t LEFT JOIN assembled a USING (doc_id)
        """,
        "winnowing_deterministic": """
            WITH h AS (
              SELECT doc_id, s,
                     list_transform(
                       generate_series(1, greatest(length(s) - 4, 1)),
                       i -> CAST(('0x' || substr(md5(substr(s, i, 5)), 1, 8))::UBIGINT AS BIGINT)) AS hs
              FROM (SELECT doc_id, lower(trim(text)) AS s FROM documents))
            SELECT doc_id,
                   CAST(len(list_distinct(list_transform(
                     generate_series(1, greatest(len(hs) - 3, 1)),
                     i -> list_min(hs[i:i+3])))) AS INT) AS n_fingerprints
            FROM h
        """,
        "lsh_recall": f"""
            WITH d AS (SELECT doc_id, text FROM documents),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.text AS text_a, b.text AS text_b
              FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
              WHERE a.doc_id % 10 = 0
              UNION ALL
              SELECT doc_id, doc_id + 1000000, text, text || ' zzzz'
              FROM d WHERE doc_id % 10 = 5),
            t AS (
              SELECT id_a, id_b,
                     string_split_regex(lower(trim(text_a)), '\\s+') AS ta,
                     string_split_regex(lower(trim(text_b)), '\\s+') AS tb
              FROM pairs),
            gr AS (
              SELECT id_a, id_b,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(ta) - 2, 1)),
                       i -> array_to_string(ta[i:i+2], ' '))) AS ga,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(tb) - 2, 1)),
                       i -> array_to_string(tb[i:i+2], ' '))) AS gb
              FROM t),
            h AS (
              SELECT id_a, id_b,
                     CASE WHEN len(list_distinct(list_concat(ga, gb))) > 0
                          THEN CAST(len(list_intersect(ga, gb)) AS DOUBLE)
                               / len(list_distinct(list_concat(ga, gb)))
                          ELSE 0 END AS jaccard,
                     list_transform(ga, s -> CAST(('0x' || substr(md5(s), 1, 8))::UBIGINT AS BIGINT)) AS ha,
                     list_transform(gb, s -> CAST(('0x' || substr(md5(s), 1, 8))::UBIGINT AS BIGINT)) AS hb
              FROM gr),
            s AS (
              SELECT jaccard,
                     ({" + ".join(f"CASE WHEN list_min(list_transform(ha, h -> ({a} * h + {b}) % {_MH_P}))"
                                  f" = list_min(list_transform(hb, h -> ({a} * h + {b}) % {_MH_P}))"
                                  " THEN 1 ELSE 0 END"
                                  for (a, b) in _MH_PERMS)}) / 4.0 AS est
              FROM h)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
                   CAST(SUM(CASE WHEN jaccard >= 0.5 AND est >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
                   ROUND(CAST(SUM(CASE WHEN jaccard >= 0.5 AND est >= 0.5 THEN 1 ELSE 0 END) AS DOUBLE)
                         / SUM(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END), 4) AS recall_r
            FROM s
        """,
        # batch LSH over the full corpus, restricted to pairs touching a
        # "new" (doc_id % 3 = 0) doc — the incremental probe must agree
        "minhash_incremental_probe": f"""
            WITH g AS (
              SELECT doc_id,
                     list_transform(
                       list_distinct(list_transform(
                         generate_series(1, greatest(len(t) - 2, 1)),
                         i -> array_to_string(t[i:i+2], ' '))),
                       s -> CAST(('0x' || substr(md5(s), 1, 8))::UBIGINT AS BIGINT)) AS hs
              FROM (SELECT doc_id,
                           string_split_regex(lower(trim(text)), '\\s+') AS t
                    FROM documents WHERE trim(text) <> '')),
            sigs AS (
              SELECT doc_id,
                     {", ".join(f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {_MH_P})) AS sig{i}"
                                for i, (a, b) in enumerate(_MH_PERMS))}
              FROM g)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   ROUND(({" + ".join(f"CASE WHEN a.sig{i} = b.sig{i} THEN 1 ELSE 0 END"
                                       for i in range(len(_MH_PERMS)))}) / 4.0, 4) AS est_r
            FROM sigs a JOIN sigs b
              ON a.doc_id < b.doc_id
             AND ((a.sig0 = b.sig0 AND a.sig1 = b.sig1)
               OR (a.sig2 = b.sig2 AND a.sig3 = b.sig3))
            WHERE (a.doc_id % 3 = 0 OR b.doc_id % 3 = 0)
              AND ({" + ".join(f"CASE WHEN a.sig{i} = b.sig{i} THEN 1 ELSE 0 END"
                                for i in range(len(_MH_PERMS)))}) / 4.0 >= 0.5
        """,
        # direct cross-side LSH over the full corpus: the fuzzy-decontaminate
        # composition (tagged keyspaces through the incremental probe)
        # must reproduce it exactly
        "fuzzy_decontaminate": f"""
            WITH g AS (
              SELECT doc_id,
                     list_transform(
                       list_distinct(list_transform(
                         generate_series(1, greatest(len(t) - 2, 1)),
                         i -> array_to_string(t[i:i+2], ' '))),
                       s -> CAST(('0x' || substr(md5(s), 1, 8))::UBIGINT AS BIGINT)) AS hs
              FROM (SELECT doc_id,
                           string_split_regex(lower(trim(text)), '\\s+') AS t
                    FROM documents WHERE trim(text) <> '')),
            sigs AS (
              SELECT doc_id,
                     {", ".join(f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {_MH_P})) AS sig{i}"
                                for i, (a, b) in enumerate(_MH_PERMS))}
              FROM g)
            SELECT CASE WHEN a.doc_id % 5 <> 0 THEN a.doc_id ELSE b.doc_id END AS doc_id,
                   CASE WHEN a.doc_id % 5 = 0 THEN a.doc_id ELSE b.doc_id END AS benchmark_id,
                   ROUND(({" + ".join(f"CASE WHEN a.sig{i} = b.sig{i} THEN 1 ELSE 0 END"
                                       for i in range(len(_MH_PERMS)))}) / 4.0, 4) AS est_r
            FROM sigs a JOIN sigs b
              ON a.doc_id < b.doc_id
             AND ((a.sig0 = b.sig0 AND a.sig1 = b.sig1)
               OR (a.sig2 = b.sig2 AND a.sig3 = b.sig3))
            WHERE (a.doc_id % 5 = 0) <> (b.doc_id % 5 = 0)
              AND ({" + ".join(f"CASE WHEN a.sig{i} = b.sig{i} THEN 1 ELSE 0 END"
                                for i in range(len(_MH_PERMS)))}) / 4.0 >= 0.5
        """,
        "minhash_deterministic": f"""
            WITH g AS (
              SELECT doc_id,
                     list_transform(
                       list_distinct(list_transform(
                         generate_series(1, greatest(len(t) - 2, 1)),
                         i -> array_to_string(t[i:i+2], ' '))),
                       s -> CAST(('0x' || substr(md5(s), 1, 8))::UBIGINT AS BIGINT)) AS hs
              FROM (SELECT doc_id,
                           string_split_regex(lower(trim(text)), '\\s+') AS t
                    FROM documents)),
            sigs AS (
              SELECT doc_id,
                     {", ".join(f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {_MH_P})) AS sig{i}"
                                for i, (a, b) in enumerate(_MH_PERMS))}
              FROM g)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   ({" + ".join(f"CASE WHEN a.sig{i} = b.sig{i} THEN 1 ELSE 0 END"
                                 for i in range(len(_MH_PERMS)))}) / 4.0 AS est_jaccard
            FROM sigs a JOIN sigs b ON b.doc_id = a.doc_id + 1
            WHERE a.doc_id % 10 = 0
        """,
        "simhash_deterministic": """
            WITH tok AS (
              SELECT doc_id, unnest(list_filter(
                       string_split_regex(lower(trim(text)), '\\s+'),
                       x -> x <> '')) AS tok
              FROM documents),
            hashed AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT AS BIGINT) AS h
              FROM tok),
            bits AS (
              SELECT doc_id, b.b AS b,
                     SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
              FROM hashed, (SELECT unnest(generate_series(0, 31)) AS b) b
              GROUP BY doc_id, b.b)
            SELECT doc_id,
                   CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS simhash32
            FROM bits GROUP BY doc_id
        """,
        "similarity_topk_cosine": """
            SELECT probe_id, vec_id, ROUND(cosine, 4) AS cosine_r, rank FROM (
              SELECT p.vec_id AS probe_id, e.vec_id AS vec_id,
                     list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST(p.embedding AS DOUBLE[])) AS cosine,
                     ROW_NUMBER() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                       CAST(p.embedding AS DOUBLE[])) DESC,
                                e.vec_id) AS rank
              FROM embeddings e
              CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 4) p
              WHERE e.vec_id >= 4)
            WHERE rank <= 5
        """,
        "ivf_topk_ann": """
            WITH cents AS (
              SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings WHERE vec_id >= 4 ORDER BY vec_id LIMIT 16),
            corpus AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id >= 4),
            assign AS (
              SELECT vec_id, v, cent_id FROM (
                SELECT c.vec_id, c.v, t.cent_id,
                       ROW_NUMBER() OVER (PARTITION BY c.vec_id
                         ORDER BY list_cosine_similarity(c.v, t.cv) DESC, t.cent_id) AS rn
                FROM corpus c CROSS JOIN cents t) WHERE rn = 1),
            probes AS (
              SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
              FROM embeddings WHERE vec_id < 4),
            probed AS (
              SELECT probe_id, pv, cent_id FROM (
                SELECT p.probe_id, p.pv, t.cent_id,
                       ROW_NUMBER() OVER (PARTITION BY p.probe_id
                         ORDER BY list_cosine_similarity(p.pv, t.cv) DESC, t.cent_id) AS rn
                FROM probes p CROSS JOIN cents t) WHERE rn <= 4),
            cand AS (
              SELECT pr.probe_id, pr.pv, a.vec_id, a.v
              FROM probed pr JOIN assign a USING (cent_id))
            SELECT probe_id, vec_id, ROUND(cosine, 4) AS cosine_r, rank FROM (
              SELECT probe_id, vec_id,
                     list_cosine_similarity(v, pv) AS cosine,
                     ROW_NUMBER() OVER (PARTITION BY probe_id
                       ORDER BY list_cosine_similarity(v, pv) DESC, vec_id) AS rank
              FROM cand)
            WHERE rank <= 5
        """,
        "repetition_signals": _REPETITION_SQL,
        "boilerplate_ngrams": """
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 x -> x <> '') AS toks
              FROM documents),
            g AS (
              SELECT doc_id,
                     CASE WHEN len(toks) >= 3
                          THEN list_transform(generate_series(1, len(toks) - 2),
                                              i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
                          ELSE [] END AS grams
              FROM t),
            occ AS (SELECT doc_id, unnest(grams) AS gram FROM g),
            boiler AS (
              SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM occ)
              GROUP BY gram HAVING count(*) >= 5),
            bc AS (
              SELECT o.doc_id, count(*) AS nb
              FROM occ o JOIN boiler b ON o.gram = b.gram
              GROUP BY o.doc_id)
            SELECT g.doc_id, len(grams) AS n_grams,
                   ROUND(CASE WHEN len(grams) > 0
                              THEN CAST(coalesce(bc.nb, 0) AS DOUBLE) / len(grams)
                              ELSE 0 END, 4) AS boilerplate_frac
            FROM g LEFT JOIN bc ON g.doc_id = bc.doc_id
        """,
        "line_dedup_c4": """
            WITH reflow AS (
              SELECT doc_id,
                     regexp_replace(text, '((\\S+ ){2}\\S+) ', '\\1' || chr(10), 'g') AS t
              FROM documents),
            lines AS (
              SELECT doc_id,
                     unnest(string_split(t, chr(10))) AS line,
                     unnest(range(1, len(string_split(t, chr(10))) + 1)) AS pos
              FROM reflow),
            norm AS (
              SELECT doc_id, pos, line,
                     lower(trim(regexp_replace(line, '\\s+', ' ', 'g'))) AS n
              FROM lines WHERE lower(trim(regexp_replace(line, '\\s+', ' ', 'g'))) <> ''),
            dup AS (SELECT n FROM norm GROUP BY n HAVING count(*) >= 3)
            SELECT doc_id,
                   count(*) AS n_lines,
                   CAST(sum(CASE WHEN d.n IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dup_lines,
                   coalesce(string_agg(CASE WHEN d.n IS NULL THEN line END, chr(10)
                                       ORDER BY pos), '') AS clean_text
            FROM norm LEFT JOIN dup d USING (n)
            GROUP BY doc_id
        """,
        "url_prefetch_filters": """
            WITH u AS (
              SELECT doc_id,
                 'https://' ||
                 CASE WHEN doc_id % 7 = 0 THEN 'ex' || doc_id || '.casino.test'
                      WHEN doc_id % 7 = 1 THEN 'sub.spamfarm.test'
                      ELSE 'site' || (doc_id % 50) || '.test' END ||
                 CASE WHEN doc_id % 5 = 0 THEN '/assets/app.js'
                      WHEN doc_id % 5 = 1 THEN '/phishing/login'
                      WHEN doc_id % 5 = 2 THEN '/article/' || doc_id
                      WHEN doc_id % 5 = 3 THEN '/style/main.css'
                      ELSE '/page/' || doc_id || '?utm=1' END AS url
              FROM documents),
            p AS (
              SELECT doc_id, url,
                     lower(regexp_extract(url, '^https://([^/]+)', 1)) AS host,
                     lower(regexp_extract(url, '^https://[^/]+(/[^?#]*)', 1)) AS path
              FROM u),
            r AS (
              SELECT doc_id, url,
                 CASE WHEN host LIKE '%.casino.test' OR host = 'casino.test'
                        OR host LIKE '%.spamfarm.test' OR host = 'spamfarm.test'
                      THEN 'blocked_domain'
                      WHEN contains(lower(url), 'phishing')
                        OR contains(lower(url), 'malware')
                        OR contains(lower(url), 'clickbait') THEN 'badword'
                      WHEN path LIKE '%.css' OR path LIKE '%.js'
                        OR path LIKE '%.ico' OR path LIKE '%.woff'
                        OR path LIKE '%.woff2' OR path LIKE '%.ttf'
                        OR path LIKE '%.map' OR path LIKE '%.svg'
                      THEN 'non_content'
                 END AS url_drop_reason
              FROM p)
            SELECT doc_id, url, url_drop_reason,
                   (url_drop_reason IS NULL) AS url_ok
            FROM r
        """,
        "c4_line_filters": """
            WITH base AS (
              SELECT doc_id,
                 'the quick brown fox jumps over doc ' || doc_id || '.' || chr(10) ||
                 'short line' || chr(10) ||
                 'every good sentence ends with punctuation number '
                   || (doc_id % 7) || '!' || chr(10) ||
                 'enable javascript to view the archive of this page.' || chr(10) ||
                 'a third proper sentence keeps the page alive number '
                   || (doc_id % 5) || '?' || chr(10) ||
                 CASE WHEN doc_id % 11 = 0
                      THEN 'filler lorem ipsum dolor sit amet line here.'
                      ELSE 'an ordinary closing sentence wraps the document here.'
                 END || chr(10) ||
                 CASE WHEN doc_id % 13 = 0 THEN 'code { sample }' ELSE '' END AS text
              FROM documents),
            t AS (
              SELECT doc_id, text,
                     list_filter(list_transform(string_split(text, chr(10)),
                                                x -> trim(x)),
                                 x -> x <> '') AS lines
              FROM base),
            k AS (
              SELECT doc_id, text, lines,
                     list_filter(lines, x ->
                        list_contains(['.', '!', '?', '"'], right(x, 1))
                        AND len(list_filter(string_split_regex(x, '\\s+'),
                                            w -> w <> '')) >= 5
                        AND NOT contains(lower(x), 'javascript')) AS kept
              FROM t),
            r AS (
              SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept_lines, kept,
                     CASE WHEN contains(text, '{') THEN 'curly_brace'
                          WHEN contains(lower(text), 'lorem ipsum') THEN 'lorem_ipsum'
                          WHEN len(kept) < 3 THEN 'too_few_lines'
                     END AS drop_reason
              FROM k)
            SELECT doc_id, n_lines, n_kept_lines, drop_reason,
                   (drop_reason IS NULL) AS keep,
                   CASE WHEN drop_reason IS NULL
                        THEN array_to_string(kept, chr(10)) END AS clean_text
            FROM r
        """,
        "gopher_quality": """
            WITH base AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 4 = 0
                          THEN text || chr(10) || '- bullet alpha' || chr(10) ||
                               '- bullet beta' || chr(10) || 'trailing thought...'
                          ELSE text END AS text
              FROM documents),
            t AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> x <> '') AS toks,
                     list_filter(list_transform(string_split(text, chr(10)),
                                                x -> trim(x)),
                                 x -> x <> '') AS lines
              FROM base),
            m AS (
              SELECT doc_id, len(toks) AS n_words,
                     CASE WHEN len(toks) > 0
                          THEN CAST(list_sum(list_transform(toks, x -> len(x)))
                                    AS DOUBLE) / len(toks) ELSE 0.0 END AS mean_wl,
                     CASE WHEN len(toks) > 0
                          THEN CAST(len(text) - len(replace(text, '#', ''))
                               + len(regexp_extract_all(text, '\\.\\.\\.|…'))
                               AS DOUBLE) / len(toks) ELSE 0.0 END AS symbol_ratio,
                     CASE WHEN len(lines) > 0
                          THEN CAST(len(list_filter(lines,
                                 x -> list_contains(['•', '-', '*'], x[1:1])))
                               AS DOUBLE) / len(lines) ELSE 0.0 END AS frac_bullet,
                     CASE WHEN len(lines) > 0
                          THEN CAST(len(list_filter(lines,
                                 x -> x LIKE '%...' OR x LIKE '%…'))
                               AS DOUBLE) / len(lines) ELSE 0.0 END AS frac_ellip,
                     CASE WHEN len(toks) > 0
                          THEN CAST(len(list_filter(toks,
                                 x -> regexp_matches(x, '[A-Za-z]')))
                               AS DOUBLE) / len(toks) ELSE 0.0 END AS frac_alpha,
                     len(list_filter(
                           ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'],
                           w -> list_contains(list_transform(toks, x -> lower(x)), w)
                         )) AS n_stop
              FROM t)
            SELECT doc_id, n_words,
                   ROUND(mean_wl, 4) AS mean_word_len,
                   ROUND(symbol_ratio, 4) AS symbol_ratio,
                   ROUND(frac_bullet, 4) AS frac_bullet_lines,
                   ROUND(frac_ellip, 4) AS frac_ellipsis_lines,
                   ROUND(frac_alpha, 4) AS frac_alpha_words,
                   n_stop AS n_stopword_kinds,
                   (n_words >= 50 AND n_words <= 100000) AS word_count_ok,
                   (mean_wl >= 3.0 AND mean_wl <= 10.0) AS mean_word_len_ok,
                   (symbol_ratio <= 0.1) AS symbol_ratio_ok,
                   (frac_bullet < 0.9) AS bullet_lines_ok,
                   (frac_ellip < 0.3) AS ellipsis_lines_ok,
                   (frac_alpha >= 0.8) AS alpha_words_ok,
                   (n_stop >= 2) AS stopwords_ok,
                   ((n_words >= 50 AND n_words <= 100000)
                    AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
                    AND symbol_ratio <= 0.1 AND frac_bullet < 0.9
                    AND frac_ellip < 0.3 AND frac_alpha >= 0.8
                    AND n_stop >= 2) AS gopher_keep
            FROM m
        """,
        # PII regexes interpolated from the SAME PII_PATTERNS constants the
        # Spark operator compiles — one source of truth, no transcription
        # drift between the engine and the oracle.
        "pii_redact": f"""
            WITH p AS (
              SELECT doc_id,
                     text || ' contact doc' || doc_id || '@example.com from 10.0.' ||
                     (doc_id % 256) || '.1 call 202-555-' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
              FROM documents)
            SELECT doc_id,
                   len(regexp_extract_all(text, '{_PII["email"][0]}')) AS n_emails,
                   len(regexp_extract_all(text, '{_PII["ip"][0]}')) AS n_ips,
                   len(regexp_extract_all(text, '{_PII["phone"][0]}')) AS n_phones,
                   regexp_replace(regexp_replace(regexp_replace(text,
                     '{_PII["email"][0]}', '|||EMAIL_ADDRESS|||', 'g'),
                     '{_PII["ip"][0]}', '|||IP_ADDRESS|||', 'g'),
                     '{_PII["phone"][0]}', '|||PHONE_NUMBER|||', 'g') AS redacted
            FROM p
        """,
        "embedding_near_dups_exact": """
            WITH planted AS (
              SELECT vec_id + 1000000 AS vec_id,
                     list_prepend(CAST(embedding[1] AS FLOAT) + CAST(0.01 AS FLOAT),
                                  embedding[2:]) AS embedding
              FROM embeddings WHERE vec_id < 8),
            allv AS (
              SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000
              UNION ALL SELECT vec_id, embedding FROM planted)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 4)
                     AS cosine_r
            FROM allv a JOIN allv b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.9
        """,
        "warc_roundtrip": """
            SELECT 'https://warc.test/doc/' || doc_id AS url,
                   CAST(strlen('<html><head><title>Doc ' || doc_id
                               || '</title></head><body><p>' || text
                               || '</p></body></html>') AS BIGINT) AS n_bytes,
                   'Doc ' || doc_id AS title
            FROM documents
        """,
        "sitemap_extract": """
            SELECT 'https://site.test/sm/' || doc_id AS url,
                   CAST(0 AS INT) AS pos,
                   'https://site.test/p/' || doc_id || '?a=1&b=' || doc_id AS loc,
                   '2024-03-0' || (doc_id % 9 + 1) AS lastmod,
                   CAST('0.' || (doc_id % 10) AS DOUBLE) AS priority
            FROM documents
            UNION ALL
            SELECT 'https://site.test/sm/' || doc_id,
                   CAST(1 AS INT),
                   'https://site.test/alt/' || doc_id,
                   NULL, NULL
            FROM documents
        """,
        "sitemap_revalidation": """
            WITH d AS (
              SELECT doc_id,
                     'https://site.test/p/' || doc_id AS url,
                     CASE WHEN doc_id % 2 = 0
                          THEN TIMESTAMP '2024-03-01 00:00:00'
                               + (doc_id % 9) * INTERVAL 1 DAY
                          ELSE NULL END AS lastmod_ts,
                     CASE WHEN doc_id % 2 = 1 THEN
                       CASE (doc_id % 6) + 1
                         WHEN 1 THEN 1 WHEN 2 THEN 24 WHEN 3 THEN 168
                         WHEN 4 THEN 720 WHEN 5 THEN 8760 ELSE NULL END
                     ELSE NULL END AS cf_hours,
                     CASE WHEN doc_id % 5 <> 0
                          THEN TIMESTAMP '2024-03-01 00:00:00'
                               + ((doc_id + 4) % 9) * INTERVAL 1 DAY
                          ELSE NULL END AS last_crawled_at
              FROM documents)
            SELECT url,
                   CASE WHEN last_crawled_at IS NULL THEN 'never_crawled'
                        WHEN lastmod_ts IS NOT NULL
                             AND lastmod_ts > last_crawled_at THEN 'modified'
                        WHEN lastmod_ts IS NULL AND cf_hours IS NOT NULL
                             AND TIMESTAMP '2024-03-10 00:00:00'
                                 >= last_crawled_at + cf_hours * INTERVAL 1 HOUR
                             THEN 'stale_changefreq'
                   END AS reason,
                   strftime(lastmod_ts, '%Y-%m-%d %H:%M:%S') AS lastmod_s,
                   strftime(last_crawled_at, '%Y-%m-%d %H:%M:%S') AS crawled_s
            FROM d WHERE
                   CASE WHEN last_crawled_at IS NULL THEN 'never_crawled'
                        WHEN lastmod_ts IS NOT NULL
                             AND lastmod_ts > last_crawled_at THEN 'modified'
                        WHEN lastmod_ts IS NULL AND cf_hours IS NOT NULL
                             AND TIMESTAMP '2024-03-10 00:00:00'
                                 >= last_crawled_at + cf_hours * INTERVAL 1 HOUR
                             THEN 'stale_changefreq'
                   END IS NOT NULL
        """,
        "robots_sitemaps": """
            SELECT 'h' || doc_id || '.test' AS host, CAST(0 AS INT) AS pos,
                   'https://h' || doc_id || '.test/sitemap.xml' AS sitemap_url
            FROM documents
            UNION ALL
            SELECT 'h' || doc_id || '.test', CAST(1 AS INT),
                   'https://h' || doc_id || '.test/sitemap-news.xml'
            FROM documents
        """,
        "cdx_surt_index": """
            SELECT 'com,example,ex' || (doc_id % 50) || ',www)/p/' || doc_id
                     || '?a=1&b=2' AS surt,
                   strftime(epoch_ms(doc_id * 1000), '%Y%m%d%H%M%S') AS cdx_ts,
                   'https://www.ex' || (doc_id % 50) || '.example.com/p/' || doc_id
                     || '?b=2&a=1' AS url,
                   sha256(text) AS digest
            FROM documents
        """,
        "warc_revisit_plan": """
            WITH caps AS (
              SELECT doc_id, doc_id % 97 AS grp,
                     'https://h' || (doc_id % 7) || '.test/p/' || doc_id AS url
              FROM documents),
            first AS (SELECT grp, min(doc_id) AS fid FROM caps GROUP BY grp)
            SELECT c.url,
                   CASE WHEN c.doc_id = f.fid THEN 'response' ELSE 'revisit' END AS kind,
                   'sha256:' || sha256('payload-' || c.grp) AS digest,
                   CASE WHEN c.doc_id = f.fid THEN NULL
                        ELSE 'https://h' || (f.fid % 7) || '.test/p/' || f.fid
                   END AS refers_to_url
            FROM caps c JOIN first f USING (grp)
        """,
        "cdx_lookup_latest": """
            WITH caps AS (
              SELECT doc_id, g,
                     'com,example,ex' || (doc_id % 50) || ',www)/p/' || doc_id
                       || '?a=1&b=2' AS surt,
                     'https://www.ex' || (doc_id % 50) || '.example.com/p/' || doc_id
                       || '?b=2&a=1' AS url,
                     strftime(epoch_ms((doc_id + g * 1000000) * 1000),
                              '%Y%m%d%H%M%S') AS cdx_ts,
                     sha256(CASE WHEN g = 0 THEN text ELSE text || '!' END) AS digest
              FROM documents, (VALUES (0), (1)) t(g)),
            prefixes AS (
              SELECT DISTINCT 'com,example,ex' || (doc_id % 50) || ',www)/p/1' AS prefix
              FROM documents),
            hits AS (
              SELECT p.prefix, c.surt, c.cdx_ts, c.url, c.digest
              FROM prefixes p JOIN caps c ON c.surt LIKE p.prefix || '%')
            SELECT prefix, surt,
                   max(cdx_ts) AS cdx_ts,
                   arg_max(url, cdx_ts) AS url,
                   arg_max(digest, cdx_ts) AS digest
            FROM hits GROUP BY prefix, surt
        """,
        "decontaminate_benchmark_overlap": """
            WITH tok AS (
              SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                         x -> x <> '') AS toks
              FROM documents),
            g AS (
              SELECT doc_id,
                     CASE WHEN len(toks) >= 3
                          THEN list_distinct([array_to_string(toks[i:i+2], ' ')
                                              for i in generate_series(1, len(toks)-2)])
                          ELSE [] END AS grams
              FROM tok),
            bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 10)
            SELECT doc_id, count(*) AS n_matched_grams
            FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= 10) d
            JOIN bench USING (gram)
            GROUP BY doc_id
        """,
        "http_freshness": """
            SELECT 'https://h' || (doc_id % 7) || '.test/p/' || doc_id AS url,
                   CASE doc_id % 6
                     WHEN 0 THEN doc_id * 10
                     WHEN 1 THEN doc_id + 5
                     WHEN 2 THEN 0
                     WHEN 3 THEN doc_id * 100
                     WHEN 4 THEN LEAST(doc_id * 100, 604800)
                     ELSE NULL
                   END AS freshness_s,
                   CASE doc_id % 6
                     WHEN 0 THEN 'max-age'
                     WHEN 1 THEN 's-maxage'
                     WHEN 2 THEN 'no-cache'
                     WHEN 3 THEN 'expires'
                     WHEN 4 THEN 'heuristic'
                     ELSE 'none'
                   END AS freshness_source
            FROM documents
        """,
        "recrawl_change_rate": """
            WITH lagged AS (
              SELECT user_id, epoch_us(ts) AS ts_us, event_type AS fp,
                     LAG(epoch_us(ts)) OVER w AS prev_ts,
                     LAG(event_type) OVER w AS prev_fp
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            per AS (
              SELECT user_id,
                     count(*) AS n_captures,
                     CAST(SUM(CASE WHEN prev_fp IS NOT NULL AND fp <> prev_fp
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
                     count(prev_ts) AS n_int,
                     AVG(CAST(ts_us - prev_ts AS DOUBLE)) / 1000000.0 AS mean_dt
              FROM lagged GROUP BY user_id),
            lam AS (
              SELECT user_id, n_captures, n_changes,
                     CASE WHEN n_int > 0 AND mean_dt > 0
                          THEN -ln((n_int - n_changes + 0.5) / (n_int + 0.5)) / mean_dt
                               + 0.0
                          END AS lambda_per_s
              FROM per)
            SELECT user_id, n_captures, n_changes,
                   ROUND(lambda_per_s * 86400, 6) AS lambda_per_day_r,
                   ROUND(LEAST(GREATEST(
                     CASE WHEN lambda_per_s > 0 THEN 1.0 / lambda_per_s
                          ELSE 864000.0 END, 600.0), 864000.0), 2) AS interval_s_r
            FROM lam
        """,
        "triangle_stats": f"""
            WITH e0 AS ({_MD5_EDGES_SQL}),
            e AS (SELECT src, dst FROM e0 WHERE src <> dst),
            und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                    FROM e),
            deg AS (SELECT node, count(*) AS degree FROM (
                      SELECT a AS node FROM und UNION ALL SELECT b FROM und)
                    GROUP BY node),
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                    FROM und e1
                    JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
                    JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
            pern AS (SELECT node, count(*) AS t FROM (
                       SELECT x AS node FROM tri
                       UNION ALL SELECT y FROM tri
                       UNION ALL SELECT z FROM tri)
                     GROUP BY node)
            SELECT d.node, d.degree,
                   coalesce(p.t, 0) AS triangles,
                   CASE WHEN d.degree >= 2
                        THEN round(2.0 * coalesce(p.t, 0)
                                   / (d.degree * (d.degree - 1)), 6)
                        ELSE 0.0 END AS clustering
            FROM deg d LEFT JOIN pern p USING (node)
        """,
        "harmonic_centrality_2hop": f"""
            WITH e0 AS ({_MD5_EDGES_SQL}),
            e AS (SELECT DISTINCT dst AS s, src AS d FROM e0 WHERE src <> dst),
            two AS (
              SELECT s, d FROM (
                SELECT DISTINCT e1.s AS s, e2.d AS d
                FROM e e1 JOIN e e2 ON e2.s = e1.d
                WHERE e2.d <> e1.s)
              EXCEPT SELECT s, d FROM e),
            n1 AS (SELECT s AS node, count(*) AS n1 FROM e GROUP BY s),
            n2 AS (SELECT s AS node, count(*) AS n2 FROM two GROUP BY s)
            SELECT n1.node, n1.n1, coalesce(n2.n2, 0) AS n2,
                   round(n1.n1 + coalesce(n2.n2, 0) / 2.0, 6) AS harmonic2
            FROM n1 LEFT JOIN n2 USING (node)
        """,
        "session_stats_30min": """
            WITH o AS (
              SELECT user_id, ts,
                     CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                               - lag(CAST(floor(epoch(ts)) AS BIGINT))
                                 OVER (PARTITION BY user_id ORDER BY ts)
                               > 1800
                          THEN 1 ELSE 0 END AS brk
              FROM events),
            s AS (
              SELECT user_id, ts,
                     CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS INT) AS session_seq
              FROM o)
            SELECT user_id, session_seq,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events,
                   max(CAST(floor(epoch(ts)) AS BIGINT))
                     - min(CAST(floor(epoch(ts)) AS BIGINT)) AS duration_s
            FROM s GROUP BY user_id, session_seq
        """,
        "sitemap_urlsets": """
            WITH pages AS (
              SELECT DISTINCT
                'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/p'
                  || CAST(doc_id AS VARCHAR) || '?a=1&q=<' || lang || '>' AS loc,
                'h' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS host,
                strftime(DATE '2026-01-01'
                         + CAST(doc_id % 28 AS INT) * INTERVAL 1 DAY,
                         '%Y-%m-%d') AS mod
              FROM documents),
            esc AS (
              SELECT host,
                     '  <url><loc>'
                       || replace(replace(replace(replace(replace(loc,
                            '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
                            '"', '&quot;'), '''', '&apos;')
                       || '</loc><lastmod>' || mod || '</lastmod></url>'
                       || chr(10) AS entry
              FROM pages)
            SELECT host, 0 AS shard, count(*) AS n_urls,
                   '<?xml version="1.0" encoding="UTF-8"?>' || chr(10)
                     || '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                     || chr(10)
                     || string_agg(entry, '' ORDER BY entry)
                     || '</urlset>' || chr(10) AS xml
            FROM esc GROUP BY host
        """,
        "lpa_communities_2sweep": f"""
            WITH e0 AS ({_MD5_EDGES_SQL}),
            und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                    FROM e0 WHERE src <> dst),
            sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
            v1 AS (SELECT a AS node, b AS community, count(*) AS cnt
                   FROM sym GROUP BY 1, 2),
            c1 AS (SELECT node, community FROM (
                     SELECT node, community,
                            row_number() OVER (PARTITION BY node
                                               ORDER BY cnt DESC, community) AS rn
                     FROM v1) WHERE rn = 1),
            v2 AS (SELECT s.a AS node, c.community, count(*) AS cnt
                   FROM sym s JOIN c1 c ON c.node = s.b GROUP BY 1, 2),
            c2 AS (SELECT node, community FROM (
                     SELECT node, community,
                            row_number() OVER (PARTITION BY node
                                               ORDER BY cnt DESC, community) AS rn
                     FROM v2) WHERE rn = 1)
            SELECT node, community FROM c2
        """,
        "phrase_search": """
            WITH tdocs AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text, '')),
                                        '([a-z0-9]+)', 1) AS terms
              FROM documents),
            pos AS (
              SELECT doc_id, unnest(terms) AS term,
                     CAST(unnest(range(len(terms))) AS BIGINT) AS pos
              FROM tdocs),
            l0 AS (SELECT doc_id, pos AS anchor FROM pos WHERE term = 'table'),
            l1 AS (SELECT doc_id, pos - 1 AS anchor FROM pos WHERE term = 'part')
            SELECT doc_id, count(*) AS matches
            FROM l0 JOIN l1 USING (doc_id, anchor)
            GROUP BY doc_id
        """,
        "term_suggestions": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(coalesce(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents),
            post AS (SELECT term, doc_id FROM toks GROUP BY term, doc_id),
            vocab AS (SELECT term, count(*) AS df FROM post GROUP BY term),
            kg AS (
              SELECT term, df,
                     unnest(list_distinct(list_transform(
                       range(1, greatest(len(term) - 1, 1) + 1),
                       i -> substr(term, CAST(i AS INT), 2)))) AS g
              FROM vocab),
            cand AS (
              SELECT term, df, count(*) AS shared FROM kg
              WHERE g IN ('ar', 'rt', 'sa')
              GROUP BY term, df),
            ver AS (
              SELECT term, df,
                     CAST(levenshtein('sart', term) AS INT) AS dist
              FROM cand
              WHERE shared >= 1 AND levenshtein('sart', term) <= 2)
            SELECT term, df, dist,
                   CAST(row_number() OVER (ORDER BY dist ASC, df DESC,
                                           term ASC) AS INT) AS rank
            FROM ver
            ORDER BY dist ASC, df DESC, term ASC
            LIMIT 10
        """,
        "query_snippets": """
            WITH tdocs AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text, '')),
                                        '([a-z0-9]+)', 1) AS terms
              FROM documents),
            pos AS (
              SELECT doc_id, unnest(terms) AS term,
                     CAST(unnest(range(len(terms))) AS BIGINT) AS pos
              FROM tdocs),
            hits AS (
              SELECT doc_id, term, pos FROM pos
              WHERE term IN ('part', 'table')),
            starts AS (SELECT DISTINCT doc_id, pos AS start FROM hits),
            cover AS (
              SELECT s.doc_id, s.start, count(DISTINCT h.term) AS n_terms
              FROM starts s
              JOIN hits h ON h.doc_id = s.doc_id
               AND h.pos >= s.start AND h.pos < s.start + 8
              GROUP BY s.doc_id, s.start),
            best AS (
              SELECT doc_id, start, n_terms,
                     row_number() OVER (PARTITION BY doc_id
                       ORDER BY n_terms DESC, start ASC) AS rk
              FROM cover)
            SELECT p.doc_id, b.start, b.n_terms,
                   string_agg(p.term, ' ' ORDER BY p.pos) AS snippet
            FROM best b
            JOIN pos p ON p.doc_id = b.doc_id
             AND p.pos >= b.start AND p.pos < b.start + 8
            WHERE b.rk = 1
            GROUP BY p.doc_id, b.start, b.n_terms
        """,
        "cocitation_pairs": f"""
            WITH e0 AS ({_MD5_EDGES_SQL}),
            e AS (SELECT DISTINCT src AS piv, dst AS node FROM e0
                  WHERE src <> dst),
            fan AS (SELECT piv FROM e GROUP BY piv
                    HAVING count(*) <= 100),
            capped AS (SELECT e.piv, e.node FROM e JOIN fan USING (piv)),
            deg AS (SELECT node, count(*) AS dg FROM capped GROUP BY node),
            pairs AS (
              SELECT c1.node AS a, c2.node AS b, count(*) AS common
              FROM capped c1
              JOIN capped c2 ON c2.piv = c1.piv AND c1.node < c2.node
              GROUP BY c1.node, c2.node HAVING count(*) >= 2)
            SELECT p.a, p.b, p.common,
                   round(p.common / (da.dg + db.dg - p.common), 6) AS jaccard
            FROM pairs p
            JOIN deg da ON da.node = p.a
            JOIN deg db ON db.node = p.b
        """,
        "content_seen_report": """
            WITH caps AS (
              SELECT 'u' || CAST(doc_id AS VARCHAR) AS url_canon,
                     printf('%012d', doc_id) AS seq,
                     'fp' || CAST(doc_id % 97 AS VARCHAR) AS content_fp
              FROM documents),
            firsts AS (
              SELECT content_fp, min(seq) AS first_key,
                     arg_min(url_canon, seq) AS f_url
              FROM caps GROUP BY content_fp)
            SELECT c.url_canon, c.seq, c.content_fp,
                   CASE WHEN c.seq = f.first_key THEN 'first'
                        ELSE 'duplicate' END AS verdict,
                   CASE WHEN c.seq <> f.first_key THEN f.f_url END AS first_url
            FROM caps c JOIN firsts f USING (content_fp)
        """,
        "retry_backoff_plan": """
            WITH caps AS (
              SELECT 'u' || CAST(user_id AS VARCHAR) AS url_canon,
                     date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS tick,
                     printf('%012d', event_id) AS seq,
                     CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::UBIGINT
                               % 100 < 30 THEN 599 ELSE 200 END AS status
              FROM events),
            keyed AS (
              SELECT url_canon, tick, status,
                     printf('%010d|%s', tick, seq) AS k,
                     status = 599 AS transient
              FROM caps),
            stepped AS (
              SELECT *, max(CASE WHEN NOT transient THEN k END)
                          OVER (PARTITION BY url_canon) AS last_ok
              FROM keyed),
            per AS (
              SELECT url_canon,
                     CAST(count(CASE WHEN transient AND (last_ok IS NULL OR k > last_ok)
                                     THEN 1 END) AS INT) AS attempts,
                     arg_max(status, k) AS last_status,
                     CAST(arg_max(tick, k) AS INT) AS last_tick
              FROM stepped GROUP BY url_canon)
            SELECT url_canon, attempts, last_tick,
                   CASE WHEN attempts <= 3 THEN 'retry' ELSE 'give_up' END AS verdict,
                   CASE WHEN attempts <= 3
                        THEN CAST(last_tick + LEAST(CAST(1 * power(2, attempts - 1) AS INT), 64)
                                  AS INT) END AS due_tick
            FROM per WHERE last_status = 599
        """,
        "split_assign_deterministic": """
            SELECT doc_id, lang, bucket,
                   CASE WHEN bucket < 5 THEN 'test'
                        WHEN bucket < 10 THEN 'val'
                        ELSE 'train' END AS split
            FROM (
              SELECT doc_id, lang,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                          % 100 AS INT) AS bucket
              FROM documents)
        """,
        "stratified_hash_sample": """
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                          % 100 AS INT) AS bucket
              FROM documents)
            WHERE bucket < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20
                                     WHEN 'zh' THEN 10 ELSE 0 END
        """,
        "stupid_backoff_ppl": """
            WITH tok AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            ref AS (SELECT t FROM tok WHERE doc_id % 2 = 0),
            uni AS (
              SELECT w1, CAST(count(*) AS DOUBLE) AS c FROM (
                SELECT unnest(t) AS w1 FROM ref) GROUP BY w1),
            bi AS (
              SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c FROM (
                SELECT t[i] AS w1, t[i+1] AS w2
                FROM ref, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS u(i))
              GROUP BY w1, w2),
            tri AS (
              SELECT w1, w2, w3, CAST(count(*) AS DOUBLE) AS c FROM (
                SELECT t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
                FROM ref, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS u(i))
              GROUP BY w1, w2, w3),
            tot AS (SELECT sum(c) AS n_total, CAST(count(*) AS DOUBLE) AS v FROM uni),
            pos AS (
              SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
              FROM tok, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
              WHERE doc_id % 2 = 1),
            sc AS (
              SELECT pos.doc_id,
                     CASE WHEN tri.c IS NOT NULL THEN tri.c / ctx2.c
                          WHEN num2.c IS NOT NULL THEN 0.4 * num2.c / ctx1.c
                          ELSE 0.4 * 0.4 * (COALESCE(num1.c, 0.0) + 0.5)
                               / (tot.n_total + 0.5 * (tot.v + 1.0)) END AS s
              FROM pos
              LEFT JOIN tri ON pos.w1 = tri.w1 AND pos.w2 = tri.w2 AND pos.w3 = tri.w3
              LEFT JOIN bi ctx2 ON pos.w1 = ctx2.w1 AND pos.w2 = ctx2.w2
              LEFT JOIN bi num2 ON pos.w2 = num2.w1 AND pos.w3 = num2.w2
              LEFT JOIN uni ctx1 ON pos.w2 = ctx1.w1
              LEFT JOIN uni num1 ON pos.w3 = num1.w1
              CROSS JOIN tot)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_trigrams,
                   round(-avg(ln(s)), 6) AS sb_nats_r
            FROM sc GROUP BY doc_id ORDER BY doc_id
        """,
        "kneser_ney_ppl": """
            WITH tok AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            ref AS (SELECT t FROM tok WHERE doc_id % 2 = 0),
            bi AS (
              SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c FROM (
                SELECT t[i] AS w1, t[i+1] AS w2
                FROM ref, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS u(i))
              GROUP BY w1, w2),
            ctx AS (SELECT w1, sum(c) AS c1, CAST(count(*) AS DOUBLE) AS fert
                    FROM bi GROUP BY w1),
            cont AS (SELECT w2, CAST(count(*) AS DOUBLE) AS contc FROM bi GROUP BY w2),
            tot AS (SELECT CAST(count(*) AS DOUBLE) AS b_types,
                           CAST(count(DISTINCT w2) AS DOUBLE) AS vc FROM bi),
            pos AS (
              SELECT doc_id, t[i] AS w1, t[i+1] AS w2
              FROM tok, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)
              WHERE doc_id % 2 = 1),
            sc AS (
              SELECT pos.doc_id,
                     CASE WHEN ctx.c1 IS NOT NULL THEN
                       (greatest(COALESCE(bi.c, 0.0) - 0.75, 0.0)
                        + 0.75 * ctx.fert
                          * ((COALESCE(cont.contc, 0.0) + 0.5)
                             / (tot.b_types + 0.5 * (tot.vc + 1.0))))
                       / ctx.c1
                     ELSE (COALESCE(cont.contc, 0.0) + 0.5)
                          / (tot.b_types + 0.5 * (tot.vc + 1.0)) END AS p
              FROM pos
              LEFT JOIN bi ON pos.w1 = bi.w1 AND pos.w2 = bi.w2
              LEFT JOIN ctx ON pos.w1 = ctx.w1
              LEFT JOIN cont ON pos.w2 = cont.w2
              CROSS JOIN tot)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   round(-avg(ln(p)), 6) AS kn_nats_r
            FROM sc GROUP BY doc_id ORDER BY doc_id
        """,
        "perplexity_buckets": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                        x -> x <> '')) AS token
              FROM documents),
            cnt AS (SELECT token, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY token),
            tot AS (SELECT sum(c) AS total, CAST(count(*) AS DOUBLE) AS v FROM cnt),
            lmt AS (SELECT token, ln((c + 0.5) / (total + 0.5 * (v + 1))) AS lp
                    FROM cnt, tot)
            SELECT doc_id,
                   count(*) AS n_tokens,
                   round(-avg(lp), 6) AS ce_r,
                   CASE WHEN -avg(lp) < 3.40 THEN 'head'
                        WHEN -avg(lp) < 3.45 THEN 'middle'
                        ELSE 'tail' END AS ppl_bucket
            FROM tok JOIN lmt USING (token)
            GROUP BY doc_id
        """,
        "charset_decode": """
            SELECT doc_id,
                   CASE CAST(doc_id % 4 AS INT)
                     WHEN 0 THEN 'utf-8'
                     WHEN 1 THEN 'windows-1252'
                     WHEN 2 THEN 'utf-16-le'
                     ELSE 'windows-1252' END AS charset,
                   CASE CAST(doc_id % 4 AS INT)
                     WHEN 0 THEN '<meta charset=utf-8><p>café ☃ ' || doc_id || '</p>'
                     WHEN 1 THEN '<p>café ' || doc_id || '</p>'
                     WHEN 2 THEN chr(65279) || 'wide ' || doc_id
                     ELSE 'euro € ' || doc_id END AS text
            FROM documents
        """,
        "host_reputation": """
            WITH d AS (
              SELECT source AS host,
                     len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                     x -> x <> '')) AS toks
              FROM documents),
            v AS (
              SELECT host, toks >= 30 AS keep,
                     least(1.0, toks / 100.0) AS score
              FROM d)
            SELECT host,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
                   ROUND(SUM(CASE WHEN keep THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6) AS keep_rate,
                   AVG(score) AS mean_score,
                   ROUND(ROUND(SUM(CASE WHEN keep THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6)
                         * AVG(score), 6) AS reputation
            FROM v GROUP BY host
        """,
        "meta_robots_directives": """
            SELECT doc_id,
                   CAST(doc_id % 6 AS INT) IN (1, 3, 4) AS noindex,
                   CAST(doc_id % 6 AS INT) IN (2, 3, 4, 5) AS nofollow,
                   CAST(doc_id % 4 AS INT) IN (1, 2) AS link_nofollow,
                   CASE CAST(doc_id % 5 AS INT)
                     WHEN 1 THEN 'https://c.test/a'
                     WHEN 2 THEN '/b'
                     WHEN 3 THEN '/c'
                     ELSE NULL END AS canonical_href,
                   CASE CAST(doc_id % 3 AS INT)
                     WHEN 1 THEN 0 WHEN 2 THEN 5 ELSE NULL END AS refresh_delay,
                   CASE CAST(doc_id % 3 AS INT)
                     WHEN 1 THEN '/next'
                     WHEN 2 THEN 'https://r.test/x'
                     ELSE NULL END AS refresh_url
            FROM documents
        """,
        "token_mixture_plan": """
            WITH d AS (
              SELECT source,
                     len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                     x -> x <> '')) AS toks
              FROM documents),
            avail AS (
              SELECT source, CAST(SUM(toks) AS BIGINT) AS tokens_available
              FROM d GROUP BY source),
            w AS (
              SELECT source, tokens_available,
                     CASE source WHEN 'src0' THEN 3.0 / 5.5
                                 WHEN 'src1' THEN 1.0 / 5.5
                                 WHEN 'src2' THEN 1.0 / 5.5
                                 WHEN 'src3' THEN 0.5 / 5.5
                                 ELSE 0.0 END AS weight
              FROM avail),
            r AS (
              SELECT source, tokens_available, weight,
                     ROUND(weight * 5000.0, 2) AS target_tokens,
                     CASE WHEN tokens_available > 0
                          THEN weight * 5000.0 / tokens_available
                          ELSE 0.0 END AS raw
              FROM w)
            SELECT source, tokens_available, weight, target_tokens,
                   raw > 2.0 AS capped,
                   ROUND(LEAST(raw, 2.0), 6) AS sample_rate,
                   CAST(ROUND(tokens_available * ROUND(LEAST(raw, 2.0), 6), 0)
                        AS BIGINT) AS planned_tokens
            FROM r
        """,
        "mixture_materialize": """
            WITH d AS (
              SELECT doc_id, source,
                     len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                     x -> x <> '')) AS toks
              FROM documents),
            avail AS (
              SELECT source, SUM(toks) AS tokens_available FROM d GROUP BY source),
            plan AS (
              SELECT source,
                     ROUND(LEAST(
                       CASE WHEN tokens_available > 0
                            THEN (CASE source WHEN 'src0' THEN 3.0 / 5.5
                                              WHEN 'src1' THEN 1.0 / 5.5
                                              WHEN 'src2' THEN 1.0 / 5.5
                                              WHEN 'src3' THEN 0.5 / 5.5
                                              ELSE 0.0 END) * 20000.0
                                 / tokens_available
                            ELSE 0.0 END, 3.0), 6) AS rate
              FROM avail),
            j AS (
              SELECT d.doc_id, d.source, p.rate FROM d
              JOIN plan p USING (source) WHERE p.rate > 0),
            e AS (
              SELECT doc_id, source, rate,
                     unnest(generate_series(0, CAST(ceil(rate) AS INT) - 1)) AS epoch
              FROM j)
            SELECT doc_id, source, CAST(epoch AS INT) AS epoch
            FROM e
            WHERE epoch < floor(rate)
               OR CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
                                           || CAST(epoch AS VARCHAR)), 1, 8))::UBIGINT
                       % 10000 AS INT)
                  < (rate - floor(rate)) * 10000
        """,
        "semdedup_clusters": """
            WITH planted AS (
              SELECT vec_id + 1000000 AS vec_id,
                     list_prepend(CAST(embedding[1] AS FLOAT) + CAST(0.01 AS FLOAT),
                                  embedding[2:]) AS embedding
              FROM embeddings WHERE vec_id < 8),
            allv AS (
              SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000
              UNION ALL SELECT vec_id, embedding FROM planted),
            cents AS (
              SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM allv ORDER BY vec_id LIMIT 16),
            corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM allv),
            assign AS (
              SELECT vec_id, v, cent_id FROM (
                SELECT c.vec_id, c.v, t.cent_id,
                       ROW_NUMBER() OVER (PARTITION BY c.vec_id
                         ORDER BY list_cosine_similarity(c.v, t.cv) DESC, t.cent_id) AS rn
                FROM corpus c CROSS JOIN cents t) WHERE rn = 1),
            dup AS (
              SELECT l.vec_id,
                     MIN(r.vec_id) AS dup_of,
                     MAX(list_cosine_similarity(l.v, r.v)) AS mc
              FROM assign l JOIN assign r
                ON l.cent_id = r.cent_id AND l.vec_id > r.vec_id
              WHERE list_cosine_similarity(l.v, r.v) >= 0.9
              GROUP BY l.vec_id)
            SELECT a.vec_id, a.cent_id,
                   dup_of IS NULL AS keep, dup_of,
                   ROUND(mc, 4) AS max_dup_cos_r
            FROM assign a LEFT JOIN dup USING (vec_id)
        """,
        "layout_scan_locality": """
            WITH pages AS (
              SELECT 'h' || (doc_id % 40) || '.test' AS host,
                     'test,h' || (doc_id % 40) || ')/p/' || doc_id AS surt,
                     doc_id AS seq
              FROM documents),
            srt AS (
              SELECT host,
                     CAST((ROW_NUMBER() OVER (ORDER BY surt, seq) - 1) // 50
                          AS INT) AS fid
              FROM pages),
            ins AS (
              SELECT host,
                     CAST((ROW_NUMBER() OVER (ORDER BY seq) - 1) // 50
                          AS INT) AS fid
              FROM pages),
            s1 AS (
              SELECT CAST(COUNT(*) AS INT) AS n_files,
                     ROUND(AVG(h), 4) AS avg_hosts_per_file_r,
                     CAST(MAX(h) AS INT) AS max_hosts_per_file
              FROM (SELECT fid, COUNT(DISTINCT host) AS h
                    FROM srt GROUP BY fid)),
            s2 AS (
              SELECT ROUND(AVG(f), 4) AS avg_files_per_host_r,
                     CAST(MAX(f) AS INT) AS max_files_per_host
              FROM (SELECT host, COUNT(DISTINCT fid) AS f
                    FROM srt GROUP BY host)),
            i1 AS (
              SELECT CAST(COUNT(*) AS INT) AS n_files,
                     ROUND(AVG(h), 4) AS avg_hosts_per_file_r,
                     CAST(MAX(h) AS INT) AS max_hosts_per_file
              FROM (SELECT fid, COUNT(DISTINCT host) AS h
                    FROM ins GROUP BY fid)),
            i2 AS (
              SELECT ROUND(AVG(f), 4) AS avg_files_per_host_r,
                     CAST(MAX(f) AS INT) AS max_files_per_host
              FROM (SELECT host, COUNT(DISTINCT fid) AS f
                    FROM ins GROUP BY host))
            SELECT 'surt' AS layout, s1.*, s2.* FROM s1, s2
            UNION ALL
            SELECT 'insertion' AS layout, i1.*, i2.* FROM i1, i2
            ORDER BY layout
        """,
        "ip_politeness_topk": """
            WITH fr AS (
              SELECT 'https://h' || (doc_id % 40) || '.test/p' || doc_id AS url,
                     'h' || (doc_id % 40) || '.test' AS host,
                     doc_id % 5 AS priority, doc_id AS seq
              FROM documents),
            ipm AS (
              SELECT host,
                     '10.0.' || CAST(b // 256 AS VARCHAR) || '.'
                       || CAST(b % 256 AS VARCHAR) AS ip
              FROM (SELECT DISTINCT host,
                      CAST(('0x' || substr(md5(host), 1, 8))::UBIGINT % 8
                           AS BIGINT) AS b
                    FROM fr)),
            ranked AS (
              SELECT fr.url, fr.host, ipm.ip,
                     ROW_NUMBER() OVER (PARTITION BY ipm.ip
                       ORDER BY priority, seq) AS rk
              FROM fr JOIN ipm USING (host))
            SELECT url, host, ip, rk <= 5 AS is_ip_selected
            FROM ranked ORDER BY url
        """,
        "retrieval_eval_ndcg": """
            WITH qs AS (SELECT doc_id AS q FROM documents WHERE doc_id < 10),
            res AS (
              SELECT q, (q*17 + r*13) % 200 AS d, r
              FROM qs, UNNEST(generate_series(1, 10)) AS t(r)),
            rels AS (
              SELECT q, dd.doc_id AS d, 1 + (dd.doc_id % 3) AS rel
              FROM qs, (SELECT doc_id FROM documents WHERE doc_id < 200) dd
              WHERE (dd.doc_id*7 + q*3) % 9 = 0),
            hits AS (
              SELECT res.q, res.r, rels.rel
              FROM res JOIN rels ON res.q = rels.q AND res.d = rels.d),
            hit_agg AS (
              SELECT q, CAST(COUNT(*) AS INT) AS n_rel_ret,
                     SUM((POW(2, rel) - 1) / LOG2(r + 1)) AS dcg,
                     MIN(r) AS first_rel_rank
              FROM hits GROUP BY q),
            ideal AS (
              SELECT q, SUM((POW(2, rel) - 1) / LOG2(irn + 1)) AS idcg FROM (
                SELECT q, rel,
                       ROW_NUMBER() OVER (PARTITION BY q
                         ORDER BY rel DESC, d) AS irn
                FROM rels) WHERE irn <= 10 GROUP BY q),
            nr AS (SELECT q, CAST(COUNT(*) AS INT) AS n_rel FROM rels GROUP BY q),
            nt AS (SELECT q, CAST(COUNT(*) AS INT) AS n_retrieved FROM res GROUP BY q)
            SELECT nt.q AS query_id, nt.n_retrieved, nr.n_rel,
                   COALESCE(h.n_rel_ret, 0) AS n_rel_ret,
                   ROUND(COALESCE(h.n_rel_ret, 0) / CAST(10 AS DOUBLE), 4)
                     AS precision_r,
                   ROUND(CASE WHEN nr.n_rel > 0
                         THEN COALESCE(h.n_rel_ret, 0) / CAST(nr.n_rel AS DOUBLE)
                         END, 4) AS recall_r,
                   ROUND(COALESCE(CAST(1 AS DOUBLE) / h.first_rel_rank, 0), 4)
                     AS rr_r,
                   ROUND(CASE WHEN COALESCE(i.idcg, 0) > 0
                         THEN COALESCE(h.dcg, 0) / i.idcg END, 4) AS ndcg_r
            FROM nt
            LEFT JOIN nr ON nt.q = nr.q
            LEFT JOIN hit_agg h ON nt.q = h.q
            LEFT JOIN ideal i ON nt.q = i.q
            ORDER BY query_id
        """,
        "prototype_prune": """
            WITH corpus AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id < 1000),
            cents AS (
              SELECT vec_id AS cent_id, v AS cv
              FROM corpus ORDER BY vec_id LIMIT 16),
            assign AS (
              SELECT vec_id, cent_id, pc FROM (
                SELECT c.vec_id, t.cent_id,
                       list_cosine_similarity(c.v, t.cv) AS pc,
                       ROW_NUMBER() OVER (PARTITION BY c.vec_id
                         ORDER BY list_cosine_similarity(c.v, t.cv) DESC,
                                  t.cent_id) AS rn
                FROM corpus c CROSS JOIN cents t) WHERE rn = 1),
            ranked AS (
              SELECT vec_id, cent_id, pc,
                     CAST(COUNT(*) OVER (PARTITION BY cent_id) AS INT)
                       AS cluster_size,
                     CAST(ROW_NUMBER() OVER (PARTITION BY cent_id
                       ORDER BY pc ASC, vec_id) AS INT) AS rank_in_cluster
              FROM assign)
            SELECT vec_id, cent_id, ROUND(pc, 4) AS proto_cos_r,
                   cluster_size, rank_in_cluster,
                   rank_in_cluster <= CEIL(0.5 * cluster_size) AS keep
            FROM ranked ORDER BY vec_id
        """,
        "anchor_text_rollup": """
            WITH e AS (
              SELECT doc_id, unnest([0, 1, 2]) AS i FROM documents),
            l AS (
              SELECT 'https://h' || CAST(doc_id % 20 AS VARCHAR) || '.test/p'
                       || CAST(doc_id AS VARCHAR) AS src,
                     (doc_id * 7 + i * 13) % 200 AS dst_id,
                     CASE WHEN (doc_id + i) % 10 = 0 THEN ''
                          WHEN (doc_id + i) % 3 = 0
                            THEN 'Page ' || CAST((doc_id * 7 + i * 13) % 200 % 7 AS VARCHAR)
                          ELSE 'topic-' || CAST((doc_id * 7 + i * 13) % 200 % 5 AS VARCHAR)
                     END AS anchor
              FROM e),
            b AS (
              SELECT 'https://h' || CAST(dst_id % 20 AS VARCHAR) || '.test/p'
                       || CAST(dst_id AS VARCHAR) AS url,
                     src,
                     CASE WHEN lower(trim(anchor)) <> '' THEN lower(trim(anchor)) END AS a
              FROM l),
            tot AS (
              SELECT url,
                     CAST(count(*) AS BIGINT) AS n_inlinks,
                     CAST(count(DISTINCT src) AS BIGINT) AS n_sources,
                     CAST(count(DISTINCT a) AS BIGINT) AS n_anchor_variants
              FROM b GROUP BY url),
            pa AS (
              SELECT url, a, count(*) AS c FROM b WHERE a IS NOT NULL GROUP BY url, a),
            top AS (
              SELECT url, a AS top_anchor, CAST(c AS BIGINT) AS top_anchor_count
              FROM (SELECT url, a, c,
                           ROW_NUMBER() OVER (PARTITION BY url ORDER BY c DESC, a) AS rn
                    FROM pa) WHERE rn = 1)
            SELECT tot.url, n_inlinks, n_sources, n_anchor_variants,
                   top_anchor, top_anchor_count
            FROM tot LEFT JOIN top USING (url)
        """,
        "priority_aging_selection": """
            WITH f AS (
              SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.test/p'
                       || CAST(doc_id AS VARCHAR) AS url_canon,
                     'h' || CAST(doc_id % 10 AS VARCHAR) || '.test' AS host,
                     CASE CAST(doc_id % 3 AS INT)
                       WHEN 0 THEN 100 WHEN 1 THEN 150 ELSE 200 END AS priority,
                     CAST(doc_id % 6 AS INT) AS dt,
                     lpad(CAST(doc_id AS VARCHAR), 12, '0') AS seq
              FROM documents),
            r AS (
              SELECT url_canon, host,
                     ROW_NUMBER() OVER (
                       PARTITION BY host
                       ORDER BY greatest(0, priority - 10 * (20 - dt)), dt, seq) AS rk
              FROM f)
            SELECT url_canon, host, rk <= 5 AS is_selected FROM r
        """,
        "adaptive_host_budgets": """
            WITH ledger AS (
              SELECT 'h' || CAST(doc_id % 21 AS VARCHAR) AS host,
                     CAST(doc_id % 5 AS INT) AS tick,
                     CASE WHEN doc_id % 11 = 0 THEN 451
                          WHEN doc_id % 13 = 0 THEN 599
                          ELSE 200 END AS status
              FROM documents),
            pt AS (
              SELECT host, tick, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN status >= 500 THEN 1 ELSE 0 END) AS BIGINT) AS e
              FROM ledger WHERE status <> 451 GROUP BY host, tick),
            h AS (
              SELECT host,
                     list({'n': n, 'e': e} ORDER BY tick) AS hist,
                     CAST(COUNT(*) AS INT) AS n_ticks,
                     CAST(SUM(n) AS BIGINT) AS total_fetches,
                     CAST(SUM(e) AS BIGINT) AS total_errors
              FROM pt GROUP BY host)
            SELECT host, n_ticks, total_fetches, total_errors,
                   CAST((list_reduce(
                     list_prepend({'n': CAST(8 AS BIGINT), 'e': CAST(0 AS BIGINT)}, hist),
                     (acc, x) -> {'n': CASE WHEN x.e * 100 > x.n * 20
                                        THEN greatest(1, acc.n // 2)
                                        ELSE least(8, acc.n + 1) END,
                                  'e': CAST(0 AS BIGINT)})).n AS INT) AS next_budget
            FROM h
        """,
        "quality_classifier_score": """
            WITH tb AS (
              SELECT doc_id, lang,
                     CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % 4096 AS INT) AS bucket
              FROM (SELECT doc_id, lang,
                           unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                              x -> x <> '')) AS tok
                    FROM documents)),
            pos AS (SELECT bucket, COUNT(*) AS pos_n FROM tb WHERE lang = 'en' GROUP BY bucket),
            neg AS (SELECT bucket, COUNT(*) AS neg_n FROM tb WHERE lang <> 'en' GROUP BY bucket),
            j AS (SELECT COALESCE(pos.bucket, neg.bucket) AS bucket,
                         COALESCE(pos_n, 0) AS pos_n, COALESCE(neg_n, 0) AS neg_n
                  FROM pos FULL JOIN neg ON pos.bucket = neg.bucket),
            tot AS (SELECT SUM(pos_n) AS pt, SUM(neg_n) AS nt FROM j),
            w AS (SELECT bucket,
                         ln((pos_n + 1.0) / (pt + 4096.0)) - ln((neg_n + 1.0) / (nt + 4096.0)) AS weight
                  FROM j, tot),
            perdoc AS (
              SELECT tb.doc_id, COUNT(*) AS n_tokens, SUM(COALESCE(w.weight, 0)) AS wsum
              FROM tb LEFT JOIN w USING (bucket) GROUP BY tb.doc_id)
            SELECT d.doc_id AS id,
                   CAST(COALESCE(n_tokens, 0) AS INT) AS n_tokens,
                   ROUND(COALESCE(wsum / n_tokens, 0), 4) AS raw_r,
                   ROUND(1.0 / (1.0 + exp(-COALESCE(wsum / n_tokens, 0))), 4) AS prob_r
            FROM documents d LEFT JOIN perdoc ON perdoc.doc_id = d.doc_id
        """,
        "dsir_importance_weights": """
            WITH base AS (
              SELECT doc_id, lang,
                     list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            fb AS (
              SELECT doc_id, lang,
                     CAST(('0x' || substr(md5(feat), 1, 8))::UBIGINT % 4096 AS INT) AS bucket
              FROM (SELECT doc_id, lang,
                           unnest(list_concat(t,
                             CASE WHEN len(t) >= 2
                                  THEN list_transform(generate_series(1, len(t) - 1),
                                                      i -> t[i] || ' ' || t[i + 1])
                                  ELSE [] END)) AS feat
                    FROM base)),
            qc AS (SELECT bucket, COUNT(*) AS qn FROM fb GROUP BY bucket),
            pc AS (SELECT bucket, COUNT(*) AS pn FROM fb WHERE lang = 'zh' GROUP BY bucket),
            qt AS (SELECT SUM(qn) AS qtot FROM qc),
            pt AS (SELECT SUM(pn) AS ptot FROM pc),
            r AS (SELECT qc.bucket,
                         ln((COALESCE(pn, 0) + 1.0) / (ptot + 4096.0))
                         - ln((qn + 1.0) / (qtot + 4096.0)) AS lr
                  FROM qc LEFT JOIN pc USING (bucket), qt, pt),
            perdoc AS (
              SELECT fb.doc_id, COUNT(*) AS nf, SUM(lr) AS lw
              FROM fb JOIN r USING (bucket) GROUP BY fb.doc_id)
            SELECT d.doc_id AS id,
                   CAST(COALESCE(nf, 0) AS INT) AS n_feats,
                   ROUND(COALESCE(lw, 0), 3) AS log_weight_r
            FROM documents d LEFT JOIN perdoc ON perdoc.doc_id = d.doc_id
        """,
        "tokenizer_fertility": """
            WITH base AS (
              SELECT doc_id,
                     len(list_filter(string_split_regex(
                       trim(COALESCE(text, '')), '\\s+'), x -> x <> ''))
                       AS n_words,
                     len(regexp_extract_all(COALESCE(text, ''),
                       '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+')) AS n_pieces,
                     length(COALESCE(text, '')) AS n_chars
              FROM documents)
            SELECT doc_id, n_words, n_pieces, n_chars,
                   ROUND(CASE WHEN n_words > 0
                              THEN CAST(n_pieces AS DOUBLE) / n_words END, 6)
                     AS fertility_r,
                   ROUND(CASE WHEN n_pieces > 0
                              THEN CAST(n_chars AS DOUBLE) / n_pieces END, 6)
                     AS chars_per_piece_r
            FROM base
        """,
        "ql_dirichlet_topk": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ), dl AS (
              SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1
            ), ctot AS (
              SELECT CAST(COALESCE(SUM(tf), 0) AS DOUBLE) AS ctot FROM post
            ), known AS (
              SELECT term, SUM(tf) / t.ctot AS ptc
              FROM post, ctot t WHERE term IN ('batch', 'dup')
              GROUP BY term, t.ctot
            ), cand AS (
              SELECT DISTINCT p.doc_id, l.dl
              FROM post p JOIN dl l USING (doc_id)
              WHERE p.term IN ('batch', 'dup')
            ), grid AS (
              SELECT c.doc_id, c.dl, k.term, k.ptc FROM cand c, known k
            ), scored AS (
              SELECT g.doc_id,
                     ln((COALESCE(p.tf, 0) + 2000.0 * g.ptc)
                        / (g.dl + 2000.0)) AS s
              FROM grid g LEFT JOIN post p
                ON p.doc_id = g.doc_id AND p.term = g.term)
            SELECT doc_id, score_r, rank FROM (
              SELECT doc_id, ROUND(SUM(s), 6) AS score_r,
                     ROW_NUMBER() OVER (ORDER BY ROUND(SUM(s), 6) DESC,
                                        doc_id ASC) AS rank
              FROM scored GROUP BY doc_id) WHERE rank <= 10
        """,
        "revisit_priority": """
            WITH lagged AS (
              SELECT user_id, epoch_us(ts) AS ts_us, event_type AS fp,
                     LAG(epoch_us(ts)) OVER w AS prev_ts,
                     LAG(event_type) OVER w AS prev_fp
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            per AS (
              SELECT user_id,
                     count(prev_ts) AS n_int,
                     CAST(SUM(CASE WHEN prev_fp IS NOT NULL AND fp <> prev_fp
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
                     AVG(CAST(ts_us - prev_ts AS DOUBLE)) / 1000000.0 AS mean_dt,
                     MAX(ts_us) AS last_us
              FROM lagged GROUP BY user_id),
            lam AS (
              SELECT user_id, last_us,
                     CASE WHEN n_int > 0 AND mean_dt > 0
                          THEN -ln((n_int - n_changes + 0.5) / (n_int + 0.5))
                               / mean_dt + 0.0
                          END AS lambda_per_s
              FROM per),
            fresh AS (
              SELECT user_id,
                     ROUND(CASE WHEN lambda_per_s IS NOT NULL
                                     AND (1709251200000000 - last_us) >= 0
                                THEN exp(-lambda_per_s *
                                         ((1709251200000000 - last_us)
                                          / 1000000.0))
                                END, 6) AS freshness_r
              FROM lam)
            SELECT user_id,
                   ROUND(CAST(1 + (user_id * 3) % 7 AS DOUBLE), 6) AS rank,
                   ROUND(1.0 - COALESCE(freshness_r, 0.0), 6) AS staleness_r,
                   ROUND(CAST(1 + (user_id * 3) % 7 AS DOUBLE)
                         * (1.0 - COALESCE(freshness_r, 0.0)), 6)
                     AS revisit_r
            FROM fresh
        """,
        "pruned_postings": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ), dft AS (
              SELECT term, COUNT(*) AS df FROM post GROUP BY 1
            ), dl AS (
              SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1
            ), consts AS (
              SELECT (SELECT COUNT(*) FROM documents) AS n,
                     (SELECT COALESCE(SUM(tf), 0) FROM post) AS tot
            ), sc AS (
              SELECT p.doc_id, p.term, p.tf,
                     ROUND(ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5))
                           * (p.tf * 2.2)
                           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl
                                            / (CAST(c.tot AS DOUBLE) / c.n))),
                           6) AS bm25_r
              FROM post p JOIN dft d USING (term) JOIN dl l USING (doc_id),
                   consts c
            )
            SELECT doc_id, term, tf, bm25_r FROM (
              SELECT doc_id, term, tf, bm25_r,
                     ROW_NUMBER() OVER (PARTITION BY term
                       ORDER BY bm25_r DESC, doc_id ASC) AS r
              FROM sc) WHERE r <= 8
        """,
        "query_clarity": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ), dft AS (
              SELECT term, COUNT(*) AS df FROM post GROUP BY 1
            ), dl AS (
              SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1
            ), consts AS (
              SELECT (SELECT COUNT(*) FROM documents) AS n,
                     (SELECT COALESCE(SUM(tf), 0) FROM post) AS tot
            ), sc AS (
              SELECT p.doc_id,
                     ROUND(ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5))
                           * (p.tf * 2.2)
                           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl
                                            / (CAST(c.tot AS DOUBLE) / c.n))),
                           6) AS bm25_r
              FROM post p JOIN dft d USING (term) JOIN dl l USING (doc_id),
                   consts c
              WHERE p.term = 'dup'
            ), fb AS (
              SELECT doc_id FROM (
                SELECT doc_id, ROUND(SUM(bm25_r), 6) AS s FROM sc
                GROUP BY doc_id ORDER BY s DESC, doc_id ASC LIMIT 10)
            ), fbt AS (
              SELECT term, SUM(tf) AS qtf FROM post SEMI JOIN fb
                USING (doc_id) GROUP BY term
            ), coll AS (
              SELECT term, SUM(tf) AS cf FROM post GROUP BY term
            ), tots AS (
              SELECT (SELECT CAST(SUM(qtf) AS DOUBLE) FROM fbt) AS qtot,
                     (SELECT CAST(SUM(tf) AS DOUBLE) FROM post) AS ctot
            )
            SELECT 10 AS n_fb_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_terms,
                   ROUND(SUM((f.qtf / t.qtot)
                             * log2((f.qtf / t.qtot) / (c.cf / t.ctot))), 6)
                     AS clarity_r
            FROM fbt f JOIN coll c USING (term), tots t
        """,
        "cori_shard_select": """
            WITH h AS (
              SELECT doc_id, text,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                              || ':s-a'), 1, 8))::UBIGINT
                          AS BIGINT) AS ha,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                              || ':s-b'), 1, 8))::UBIGINT
                          AS BIGINT) AS hb,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                              || ':s-c'), 1, 8))::UBIGINT
                          AS BIGINT) AS hc,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                              || ':s-d'), 1, 8))::UBIGINT
                          AS BIGINT) AS hd
              FROM documents
            ), sharded AS (
              SELECT CASE WHEN hd >= ha AND hd >= hb AND hd >= hc THEN 's-d'
                          WHEN hc >= ha AND hc >= hb THEN 's-c'
                          WHEN hb >= ha THEN 's-b'
                          ELSE 's-a' END AS shard,
                     doc_id, text
              FROM h
            ), tok AS (
              SELECT shard, doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM sharded
            ), dfp AS (
              SELECT shard, term, COUNT(DISTINCT doc_id) AS df,
                     COUNT(*) AS toks
              FROM tok GROUP BY 1, 2
            ), cwt AS (
              SELECT shard, SUM(toks) AS cw FROM dfp GROUP BY 1
            ), consts AS (
              SELECT COUNT(*) AS n_shards, AVG(cw) AS avg_cw FROM cwt
            ), cf AS (
              SELECT term, COUNT(*) AS cf FROM dfp
              WHERE term IN ('batch', 'dup', 'small') GROUP BY 1
            ), beliefs AS (
              SELECT d.shard,
                     0.4 + 0.6
                       * (d.df / (d.df + 50.0 + 150.0 * w.cw / c.avg_cw))
                       * (ln((c.n_shards + 0.5) / f.cf)
                          / ln(c.n_shards + 1.0)) AS belief
              FROM dfp d JOIN cwt w USING (shard) JOIN cf f USING (term),
                   consts c
              WHERE d.term IN ('batch', 'dup', 'small')
            ), per AS (
              SELECT w.shard,
                     ROUND((COALESCE(b.s, 0) + 0.4 * (3 - COALESCE(b.n, 0)))
                           / 3.0, 6) AS score_r
              FROM cwt w LEFT JOIN (
                SELECT shard, SUM(belief) AS s, COUNT(*) AS n
                FROM beliefs GROUP BY 1) b USING (shard)
            )
            SELECT shard, score_r,
                   CAST(ROW_NUMBER() OVER (ORDER BY score_r DESC, shard ASC)
                        AS INT) AS rank
            FROM per
        """,
        "mmr_rerank": """
            WITH corpus AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id >= 4
            ), probe AS (
              SELECT CAST(embedding AS DOUBLE[]) AS pv
              FROM embeddings WHERE vec_id = 0
            ), rels AS (
              SELECT vec_id, list_cosine_similarity(v, pv) AS rel, v
              FROM corpus, probe
            ), cands AS (
              SELECT * FROM rels
              ORDER BY ROUND(rel, 4) DESC, vec_id ASC LIMIT 20
            ), s1 AS (
              SELECT * FROM cands
              ORDER BY ROUND(rel, 4) DESC, vec_id ASC LIMIT 1
            ), r2 AS (
              SELECT c.vec_id, c.rel, c.v,
                     ROUND(0.7 * c.rel
                           - 0.3 * list_cosine_similarity(c.v, s1.v), 4)
                       AS mmr
              FROM cands c, s1 WHERE c.vec_id <> s1.vec_id
            ), s2 AS (
              SELECT * FROM r2 ORDER BY mmr DESC, vec_id ASC LIMIT 1
            ), r3 AS (
              SELECT c.vec_id, c.rel,
                     ROUND(0.7 * c.rel
                           - 0.3 * GREATEST(
                               list_cosine_similarity(c.v, s1.v),
                               list_cosine_similarity(c.v, s2.v)), 4) AS mmr
              FROM cands c, s1, s2
              WHERE c.vec_id NOT IN (s1.vec_id, s2.vec_id)
            ), s3 AS (
              SELECT vec_id, rel, mmr FROM r3
              ORDER BY mmr DESC, vec_id ASC LIMIT 1
            )
            SELECT 1 AS rank, vec_id AS id, ROUND(rel, 4) AS rel_r,
                   ROUND(rel, 4) AS mmr_r FROM s1
            UNION ALL
            SELECT 2, vec_id, ROUND(rel, 4), mmr FROM s2
            UNION ALL
            SELECT 3, vec_id, ROUND(rel, 4), mmr FROM s3
        """,
        "batch_bm25_topk": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ), dft AS (
              SELECT term, COUNT(*) AS df FROM post GROUP BY 1
            ), dl AS (
              SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1
            ), consts AS (
              SELECT (SELECT COUNT(*) FROM documents) AS n,
                     (SELECT COALESCE(SUM(tf), 0) FROM post) AS tot
            ), sc AS (
              SELECT p.doc_id, p.term,
                     ROUND(ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5))
                           * (p.tf * 2.2)
                           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl
                                            / (CAST(c.tot AS DOUBLE) / c.n))),
                           6) AS bm25_r
              FROM post p JOIN dft d USING (term) JOIN dl l USING (doc_id),
                   consts c
            ), qterms AS (
              SELECT * FROM (VALUES
                (1, 'dup'), (1, 'batch'),
                (2, 'spark'), (2, 'window'), (2, 'merge'),
                (3, 'vector'), (3, 'group')) AS t(query_id, term)
            ), per AS (
              SELECT q.query_id, s.doc_id,
                     ROUND(SUM(s.bm25_r), 6) AS score_r
              FROM sc s JOIN qterms q USING (term)
              GROUP BY 1, 2)
            SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_r,
                   rank
            FROM (
              SELECT query_id, doc_id, score_r,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score_r DESC, doc_id ASC) AS rank
              FROM per) WHERE rank <= 10
        """,
        "prf_search": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ), dft AS (
              SELECT term, COUNT(*) AS df FROM post GROUP BY 1
            ), dl AS (
              SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1
            ), consts AS (
              SELECT (SELECT COUNT(*) FROM documents) AS n,
                     (SELECT COALESCE(SUM(tf), 0) FROM post) AS tot
            ), sc AS (
              SELECT p.doc_id, p.term,
                     ROUND(ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5))
                           * (p.tf * 2.2)
                           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl
                                            / (CAST(c.tot AS DOUBLE) / c.n))),
                           6) AS bm25_r
              FROM post p JOIN dft d USING (term) JOIN dl l USING (doc_id),
                   consts c
            ), fb AS (
              SELECT doc_id FROM (
                SELECT doc_id, ROUND(SUM(bm25_r), 6) AS s
                FROM sc WHERE term = 'dup' GROUP BY doc_id
                ORDER BY s DESC, doc_id ASC LIMIT 5)
            ), expansion AS (
              SELECT term, 0.4 AS weight FROM (
                SELECT term, ROUND(SUM(bm25_r), 6) AS w
                FROM sc SEMI JOIN fb USING (doc_id)
                WHERE term <> 'dup'
                GROUP BY term ORDER BY w DESC, term ASC LIMIT 5)
            ), weighted AS (
              SELECT 'dup' AS term, 1.0 AS weight
              UNION ALL SELECT term, weight FROM expansion
            ), rescored AS (
              SELECT s.doc_id,
                     ROUND(SUM(s.bm25_r * w.weight), 6) AS score_r
              FROM sc s JOIN weighted w USING (term)
              GROUP BY s.doc_id)
            SELECT doc_id, score_r, rank FROM (
              SELECT doc_id, score_r,
                     ROW_NUMBER() OVER (ORDER BY score_r DESC, doc_id ASC)
                       AS rank
              FROM rescored) WHERE rank <= 10
        """,
        "term_drift_kl": """
            WITH ptok AS (
              SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), ctok AS (
              SELECT unnest(regexp_extract_all(lower(
                       coalesce(text, '')
                       || CASE WHEN doc_id % 4 = 0
                               THEN ' driftword driftword' ELSE '' END),
                       '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), pc AS (SELECT term, COUNT(*) AS pc FROM ptok GROUP BY 1),
            cc AS (SELECT term, COUNT(*) AS cc FROM ctok GROUP BY 1),
            j AS (
              SELECT COALESCE(pc.term, cc.term) AS term,
                     COALESCE(pc.pc, 0) AS pc, COALESCE(cc.cc, 0) AS cc
              FROM pc FULL OUTER JOIN cc ON pc.term = cc.term
            ), tot AS (
              SELECT CAST(SUM(pc) AS DOUBLE) AS np,
                     CAST(SUM(cc) AS DOUBLE) AS nc,
                     CAST(COUNT(*) AS DOUBLE) AS v
              FROM j
            ), scored AS (
              SELECT term,
                     ((cc + 0.5) / (nc + 0.5 * v))
                     * ln(((cc + 0.5) / (nc + 0.5 * v))
                          / ((pc + 0.5) / (np + 0.5 * v))) AS contrib
              FROM j, tot)
            SELECT '__TOTAL__' AS term, ROUND(SUM(contrib), 6) AS kl_r
            FROM scored
            UNION ALL
            SELECT term, ROUND(contrib, 6) FROM (
              SELECT term, contrib FROM scored
              ORDER BY abs(contrib) DESC, term ASC LIMIT 20)
        """,
        "frontier_eta": """
            WITH pend AS (
              SELECT 'h' || CAST(doc_id % 25 AS VARCHAR) AS host,
                     COUNT(*) AS pending
              FROM documents GROUP BY 1
            ), budgets AS (
              SELECT 'h' || CAST(i AS VARCHAR) AS host, 4 AS b
              FROM (SELECT unnest(range(5)) AS i)
            )
            SELECT p.host, p.pending,
                   CAST(GREATEST(COALESCE(b.b, 16), 1) AS INT) AS budget,
                   CAST(ceil(p.pending
                             / CAST(GREATEST(COALESCE(b.b, 16), 1) AS DOUBLE))
                        AS INT) AS eta_ticks
            FROM pend p LEFT JOIN budgets b USING (host)
        """,
        "zorder_locality": """
            WITH grid AS (
              SELECT CAST(doc_id % 32 AS INT) AS a,
                     CAST((doc_id // 32) % 32 AS INT) AS b
              FROM documents
            ), keyed AS (
              SELECT a, b,
                     CAST(list_sum(list_transform(range(0, 5), i ->
                       ((a >> i) & 1) * (1 << (2 * i + 1))
                       + ((b >> i) & 1) * (1 << (2 * i)))) AS BIGINT) AS z
              FROM grid
            ), l1 AS (
              SELECT 'a_then_b' AS layout, a, b,
                     CAST((ROW_NUMBER() OVER (ORDER BY a, b, a, b) - 1) // 32
                          AS INT) AS fid
              FROM keyed
            ), l2 AS (
              SELECT 'b_then_a', a, b,
                     CAST((ROW_NUMBER() OVER (ORDER BY b, a, a, b) - 1) // 32
                          AS INT)
              FROM keyed
            ), l3 AS (
              SELECT 'zorder', a, b,
                     CAST((ROW_NUMBER() OVER (ORDER BY z, a, b) - 1) // 32
                          AS INT)
              FROM keyed
            ), allf AS (
              SELECT * FROM l1 UNION ALL SELECT * FROM l2
              UNION ALL SELECT * FROM l3
            )
            SELECT layout,
                   CAST(COUNT(DISTINCT fid) AS INT) AS n_files,
                   CAST(COUNT(DISTINCT CASE WHEN a BETWEEN 0 AND 7
                                             AND b BETWEEN 0 AND 7
                                            THEN fid END) AS INT)
                     AS files_touched,
                   ROUND(COUNT(DISTINCT CASE WHEN a BETWEEN 0 AND 7
                                              AND b BETWEEN 0 AND 7
                                             THEN fid END)
                         / CAST(COUNT(DISTINCT fid) AS DOUBLE), 6)
                     AS files_touched_frac_r
            FROM allf GROUP BY layout
        """,
        "kcore_survivors": """
            WITH e AS (
              SELECT doc_id AS s, (doc_id * 11 + 5) % 150 AS d FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 17 + 2) % 150
              FROM documents WHERE doc_id % 3 = 0
            ), u0 AS (
              SELECT DISTINCT LEAST(s, d) AS a, GREATEST(s, d) AS b
              FROM e WHERE s <> d
            ), d1 AS (
              SELECT node, COUNT(*) AS deg FROM (
                SELECT a AS node FROM u0 UNION ALL SELECT b FROM u0)
              GROUP BY node
            ), k1 AS (SELECT node FROM d1 WHERE deg >= 3),
            u1 AS (
              SELECT u0.a, u0.b FROM u0
              JOIN k1 x ON x.node = u0.a JOIN k1 y ON y.node = u0.b
            ), d2 AS (
              SELECT node, COUNT(*) AS deg FROM (
                SELECT a AS node FROM u1 UNION ALL SELECT b FROM u1)
              GROUP BY node
            ), k2 AS (SELECT node FROM d2 WHERE deg >= 3),
            u2 AS (
              SELECT u1.a, u1.b FROM u1
              JOIN k2 x ON x.node = u1.a JOIN k2 y ON y.node = u1.b
            ), d3 AS (
              SELECT node, COUNT(*) AS deg FROM (
                SELECT a AS node FROM u2 UNION ALL SELECT b FROM u2)
              GROUP BY node
            ), k3 AS (SELECT node FROM d3 WHERE deg >= 3),
            u3 AS (
              SELECT u2.a, u2.b FROM u2
              JOIN k3 x ON x.node = u2.a JOIN k3 y ON y.node = u2.b
            )
            SELECT DISTINCT node FROM (
              SELECT a AS node FROM u3 UNION ALL SELECT b FROM u3)
        """,
        "dictionary_frontcoding": """
            WITH vocab AS (
              SELECT DISTINCT term FROM (
                SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '([a-z0-9]+)', 1)) AS term
                FROM documents)
            ), lagged AS (
              SELECT term,
                     COALESCE(LAG(term) OVER (
                       PARTITION BY substr(term, 1, 2) ORDER BY term), '')
                       AS prev
              FROM vocab
            ), per AS (
              SELECT length(term) AS tl,
                     CASE WHEN prev = '' OR
                               LEAST(length(term), length(prev)) <= 0 THEN 0
                          ELSE len(list_filter(
                            range(1, LEAST(length(term), length(prev)) + 1),
                            i -> substr(term, 1, CAST(i AS INT))
                                 = substr(prev, 1, CAST(i AS INT))))
                          END AS cpl
              FROM lagged)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
                   CAST(SUM(tl + 1) AS BIGINT) AS raw_bytes,
                   CAST(SUM(tl - cpl + 2) AS BIGINT) AS coded_bytes,
                   CAST(SUM(cpl - 1) AS BIGINT) AS saved_bytes,
                   ROUND(SUM(tl - cpl + 2)
                         / CAST(SUM(tl + 1) AS DOUBLE), 6) AS ratio_r
            FROM per
        """,
        "fixed_capture_delta": """
            WITH prev AS (
              SELECT doc_id, COALESCE(text, '') AS text FROM documents
            ), curr AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0
                            THEN COALESCE(text, '')
                                 || ' EDIT BLOCK APPENDED HERE'
                          WHEN doc_id % 3 = 1 THEN COALESCE(text, '')
                          ELSE 'completely rewritten page body '
                               || CAST(doc_id AS VARCHAR) END AS text
              FROM documents WHERE doc_id % 10 <> 0
            ), pcen AS (
              SELECT doc_id AS _id,
                     md5(substr(text, CAST(1 + i * 64 AS INT), 64)) AS h,
                     COUNT(*) AS n,
                     MIN(CAST(length(substr(text, CAST(1 + i * 64 AS INT), 64))
                              AS BIGINT)) AS len
              FROM (SELECT doc_id, text,
                           unnest(range(0, CAST(ceil(length(text) / 64.0)
                                                AS BIGINT))) AS i
                    FROM prev WHERE length(text) > 0)
              GROUP BY 1, 2
            ), ccen AS (
              SELECT doc_id AS _id,
                     md5(substr(text, CAST(1 + i * 64 AS INT), 64)) AS h,
                     COUNT(*) AS n,
                     MIN(CAST(length(substr(text, CAST(1 + i * 64 AS INT), 64))
                              AS BIGINT)) AS len
              FROM (SELECT doc_id, text,
                           unnest(range(0, CAST(ceil(length(text) / 64.0)
                                                AS BIGINT))) AS i
                    FROM curr WHERE length(text) > 0)
              GROUP BY 1, 2
            ), j AS (
              SELECT COALESCE(p._id, c._id) AS _id,
                     COALESCE(p.n, 0) AS pn, COALESCE(c.n, 0) AS cn,
                     COALESCE(p.len, c.len) AS len
              FROM pcen p FULL OUTER JOIN ccen c
                ON p._id = c._id AND p.h = c.h
            ), per AS (
              SELECT _id,
                     CAST(SUM(pn * len) AS BIGINT) AS prev_chars,
                     CAST(SUM(cn * len) AS BIGINT) AS curr_chars,
                     CAST(SUM(LEAST(pn, cn) * len) AS BIGINT) AS shared_chars
              FROM j GROUP BY 1)
            SELECT _id AS doc_id, prev_chars, curr_chars, shared_chars,
                   ROUND(CASE WHEN GREATEST(prev_chars, curr_chars) > 0
                              THEN 1.0 - CAST(shared_chars AS DOUBLE)
                                   / GREATEST(prev_chars, curr_chars)
                              ELSE 0.0 END, 6) AS changed_frac_r
            FROM per
        """,
        "boolean_search": """
            WITH seen AS (
              SELECT DISTINCT doc_id, term FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '([a-z0-9]+)', 1)) AS term
                FROM documents)
              WHERE term IN ('spark', 'merge', 'window', 'join', 'dup')
            ), flags AS (
              SELECT doc_id,
                     CAST(SUM(CASE WHEN term IN ('merge', 'spark')
                                   THEN 1 ELSE 0 END) AS INT) AS n_must,
                     CAST(SUM(CASE WHEN term IN ('join', 'window')
                                   THEN 1 ELSE 0 END) AS INT) AS n_should,
                     SUM(CASE WHEN term = 'dup' THEN 1 ELSE 0 END) AS neg
              FROM seen GROUP BY doc_id)
            SELECT doc_id, n_must, n_should FROM flags
            WHERE neg = 0 AND n_must = 2 AND n_should >= 1
        """,
        "more_like_this": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(coalesce(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ), dft AS (
              SELECT term, COUNT(*) AS df FROM post GROUP BY 1
            ), nd AS (SELECT COUNT(*) AS n FROM documents),
            w AS (
              SELECT p.doc_id, p.term, d.df,
                     p.tf * ln(1 + CAST(c.n AS DOUBLE) / d.df) AS w
              FROM post p JOIN dft d USING (term), nd c
            ), norms AS (
              SELECT doc_id, sqrt(SUM(w * w)) AS norm FROM w GROUP BY 1
            ), src AS (
              SELECT w.term, w.w AS w_src FROM w, nd c
              WHERE w.doc_id = 0 AND w.df <= c.n * 0.8
            ), cand AS (
              SELECT w.doc_id, SUM(w.w * s.w_src) AS dot
              FROM w JOIN src s USING (term)
              WHERE w.doc_id <> 0 GROUP BY 1
            ), scored AS (
              SELECT c.doc_id,
                     ROUND(c.dot / (n.norm *
                       (SELECT norm FROM norms WHERE doc_id = 0)), 6)
                       AS cosine_r
              FROM cand c JOIN norms n USING (doc_id))
            SELECT doc_id, cosine_r, rank FROM (
              SELECT doc_id, cosine_r,
                     ROW_NUMBER() OVER (ORDER BY cosine_r DESC, doc_id ASC)
                       AS rank
              FROM scored) WHERE rank <= 10
        """,
        "term_proximity_rerank": """
            WITH tdocs AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text, '')),
                                        '([a-z0-9]+)', 1) AS terms
              FROM documents),
            pos AS (
              SELECT doc_id, unnest(terms) AS term,
                     CAST(unnest(range(len(terms))) AS BIGINT) AS pos
              FROM tdocs),
            qp AS (
              SELECT doc_id, term, pos FROM pos
              WHERE term IN ('merge', 'spark', 'window')),
            present AS (
              SELECT doc_id, CAST(COUNT(DISTINCT term) AS INT)
                       AS n_terms_present
              FROM qp GROUP BY 1),
            pairmin AS (
              SELECT a.doc_id, a.term AS ta, b.term AS tb,
                     MIN(ABS(a.pos - b.pos)) AS md
              FROM qp a JOIN qp b
                ON a.doc_id = b.doc_id AND a.term < b.term
              GROUP BY 1, 2, 3),
            perdoc AS (
              SELECT doc_id, CAST(MIN(md) AS INT) AS min_pair_dist,
                     ROUND(SUM(1.0 / md), 6) AS prox_r
              FROM pairmin GROUP BY 1)
            SELECT p.doc_id, p.n_terms_present, d.min_pair_dist,
                   COALESCE(d.prox_r, 0.0) AS prox_r
            FROM present p LEFT JOIN perdoc d USING (doc_id)
        """,
        "textrank_keywords": """
            WITH toks AS (
              SELECT list_filter(
                       regexp_split_to_array(lower(coalesce(text, '')),
                                             '[^a-z0-9]+'),
                       x -> length(x) >= 2) AS t
              FROM documents),
            pairs AS (
              SELECT unnest(list_zip(t[1:len(t) - 1], t[2:len(t)]),
                            recursive := true)
              FROM toks WHERE len(t) >= 2),
            census AS (
              SELECT element1 AS w1, element2 AS w2, COUNT(*) AS c
              FROM pairs WHERE element1 <> element2 GROUP BY 1, 2),
            edges AS (
              SELECT src, dst, CAST(SUM(c) AS DOUBLE) AS w FROM (
                SELECT w1 AS src, w2 AS dst, c FROM census
                UNION ALL
                SELECT w2, w1, c FROM census)
              GROUP BY 1, 2),
            nodes AS (
              SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
            wout AS (SELECT src AS node, SUM(w) AS wout FROM edges GROUP BY 1),
            r0 AS (SELECT n.node, 1.0 AS rank, wout.wout
                   FROM nodes n LEFT JOIN wout USING (node)),
            c1 AS (SELECT e.dst AS node, SUM(r.rank * e.w / r.wout) AS in_sum
                   FROM edges e JOIN r0 r ON r.node = e.src GROUP BY 1),
            r1 AS (SELECT r0.node,
                          0.15 + 0.85 * COALESCE(c1.in_sum, 0) AS rank,
                          r0.wout
                   FROM r0 LEFT JOIN c1 USING (node)),
            c2 AS (SELECT e.dst AS node, SUM(r.rank * e.w / r.wout) AS in_sum
                   FROM edges e JOIN r1 r ON r.node = e.src GROUP BY 1),
            r2 AS (SELECT r1.node,
                          0.15 + 0.85 * COALESCE(c2.in_sum, 0) AS rank
                   FROM r1 LEFT JOIN c2 USING (node))
            SELECT node AS term, ROUND(rank, 6) AS rank_r FROM r2
        """,
        "rendezvous_shards": """
            WITH h AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                              || ':s-a'), 1, 8))::UBIGINT
                          AS BIGINT) AS ha,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                              || ':s-b'), 1, 8))::UBIGINT
                          AS BIGINT) AS hb,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                              || ':s-c'), 1, 8))::UBIGINT
                          AS BIGINT) AS hc,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                              || ':s-d'), 1, 8))::UBIGINT
                          AS BIGINT) AS hd
              FROM documents)
            SELECT doc_id,
                   CASE WHEN hd >= ha AND hd >= hb AND hd >= hc THEN 's-d'
                        WHEN hc >= ha AND hc >= hb THEN 's-c'
                        WHEN hb >= ha THEN 's-b'
                        ELSE 's-a' END AS shard
            FROM h
        """,
        "bm25f_search": """
            WITH anch AS (
              SELECT doc_id, text,
                     CASE WHEN doc_id % 7 = 0 THEN NULL
                          WHEN doc_id % 5 = 0 THEN 'merge spark'
                          WHEN doc_id % 5 = 1 THEN 'spark window guide'
                          ELSE 'misc anchor text' END AS anchor_text
              FROM documents
            ), nd AS (SELECT COUNT(*) AS n FROM anch),
            btok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM anch
            ), atok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(anchor_text,
                                                              '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM anch
            ), bdl AS (
              SELECT a.doc_id, COUNT(t.term) AS dl
              FROM anch a LEFT JOIN btok t USING (doc_id) GROUP BY 1
            ), adl AS (
              SELECT a.doc_id, COUNT(t.term) AS dl
              FROM anch a LEFT JOIN atok t USING (doc_id) GROUP BY 1
            ), bavg AS (SELECT SUM(dl) / CAST((SELECT n FROM nd) AS DOUBLE)
                          AS avgl FROM bdl),
            aavg AS (SELECT SUM(dl) / CAST((SELECT n FROM nd) AS DOUBLE)
                       AS avgl FROM adl),
            bpost AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM btok
              WHERE term IN ('merge', 'spark', 'window') GROUP BY 1, 2
            ), apost AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM atok
              WHERE term IN ('merge', 'spark', 'window') GROUP BY 1, 2
            ), wtf AS (
              SELECT p.doc_id, p.term,
                     1.0 * p.tf / (0.25 + 0.75 * l.dl / g.avgl) AS c
              FROM bpost p JOIN bdl l USING (doc_id), bavg g
              UNION ALL
              SELECT p.doc_id, p.term,
                     2.0 * p.tf / (0.25 + 0.75 * l.dl / g.avgl)
              FROM apost p JOIN adl l USING (doc_id), aavg g
            ), pseudo AS (
              SELECT doc_id, term, SUM(c) AS tft FROM wtf GROUP BY 1, 2
            ), dfa AS (
              SELECT term, COUNT(*) AS df FROM pseudo GROUP BY 1
            ), scored AS (
              SELECT p.doc_id,
                     ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5))
                       * p.tft / (1.2 + p.tft) AS s
              FROM pseudo p JOIN dfa d USING (term), nd c
            )
            SELECT doc_id, score_r, rank FROM (
              SELECT doc_id, ROUND(SUM(s), 6) AS score_r,
                     ROW_NUMBER() OVER (ORDER BY ROUND(SUM(s), 6) DESC,
                                        doc_id ASC) AS rank
              FROM scored GROUP BY doc_id) WHERE rank <= 10
        """,
        "spam_mass_2iter": """
            WITH e AS (
              SELECT doc_id AS s, (doc_id * 11 + 5) % 150 AS d FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 17 + 2) % 150
              FROM documents WHERE doc_id % 3 = 0
            ), nodes AS (
              SELECT DISTINCT node FROM (
                SELECT s AS node FROM e UNION ALL SELECT d FROM e)
            ), od AS (SELECT s AS node, COUNT(*) AS outdeg FROM e GROUP BY s),
            r0 AS (
              SELECT n.node, CAST(1.0 AS DOUBLE) AS rank, od.outdeg
              FROM nodes n LEFT JOIN od USING (node)),
            pc1 AS (SELECT e.d AS node, SUM(r.rank / r.outdeg) AS in_sum
                    FROM e JOIN r0 r ON r.node = e.s GROUP BY e.d),
            r1 AS (SELECT r0.node,
                          0.15 + 0.85 * COALESCE(pc1.in_sum, 0) AS rank,
                          r0.outdeg
                   FROM r0 LEFT JOIN pc1 USING (node)),
            pc2 AS (SELECT e.d AS node, SUM(r.rank / r.outdeg) AS in_sum
                    FROM e JOIN r1 r ON r.node = e.s GROUP BY e.d),
            r2 AS (SELECT r1.node,
                          0.15 + 0.85 * COALESCE(pc2.in_sum, 0) AS rank
                   FROM r1 LEFT JOIN pc2 USING (node)),
            seeds AS (
              SELECT doc_id AS node FROM documents WHERE doc_id % 50 = 0
            ), ns AS (SELECT COUNT(*) AS n FROM seeds),
            base AS (
              SELECT n.node, od.outdeg,
                     CASE WHEN sd.node IS NOT NULL THEN 1.0 / ns.n
                          ELSE 0.0 END AS d0
              FROM nodes n LEFT JOIN od USING (node)
                           LEFT JOIN seeds sd USING (node), ns
            ),
            t0 AS (SELECT node, d0 AS trust, outdeg, d0 AS dd0 FROM base),
            tc1 AS (SELECT e.d AS node, SUM(t.trust / t.outdeg) AS in_sum
                    FROM e JOIN t0 t ON t.node = e.s GROUP BY e.d),
            t1 AS (SELECT t0.node,
                          0.15 * t0.dd0 + 0.85 * COALESCE(tc1.in_sum, 0)
                            AS trust,
                          t0.outdeg, t0.dd0
                   FROM t0 LEFT JOIN tc1 USING (node)),
            tc2 AS (SELECT e.d AS node, SUM(t.trust / t.outdeg) AS in_sum
                    FROM e JOIN t1 t ON t.node = e.s GROUP BY e.d),
            t2 AS (SELECT t1.node,
                          0.15 * t1.dd0 + 0.85 * COALESCE(tc2.in_sum, 0)
                            AS trust
                   FROM t1 LEFT JOIN tc2 USING (node)),
            nn AS (SELECT COUNT(*) AS n FROM nodes)
            SELECT r2.node,
                   ROUND(r2.rank, 6) AS pr_r,
                   ROUND(nn.n * t2.trust, 6) AS core_r,
                   ROUND(r2.rank - nn.n * t2.trust, 6) AS mass_r,
                   ROUND(CASE WHEN r2.rank > 0
                              THEN (r2.rank - nn.n * t2.trust) / r2.rank
                              END, 6) AS rel_mass_r
            FROM r2 JOIN t2 USING (node), nn
        """,
        "rrf_fusion": """
            WITH a AS (
              SELECT doc_id,
                     CAST(ROW_NUMBER() OVER (
                       ORDER BY (doc_id * 13 + 5) % 997 DESC, doc_id ASC)
                       AS INT) AS rank
              FROM documents
              ORDER BY (doc_id * 13 + 5) % 997 DESC, doc_id ASC LIMIT 25
            ), b AS (
              SELECT doc_id,
                     CAST(ROW_NUMBER() OVER (
                       ORDER BY (doc_id * 31 + 2) % 997 DESC, doc_id ASC)
                       AS INT) AS rank
              FROM documents
              ORDER BY (doc_id * 31 + 2) % 997 DESC, doc_id ASC LIMIT 25
            ), u AS (
              SELECT doc_id, 1.0 / (60 + rank) AS c FROM a
              UNION ALL
              SELECT doc_id, 1.0 / (60 + rank) FROM b
            )
            SELECT doc_id, CAST(COUNT(*) AS INT) AS n_lists,
                   ROUND(SUM(c), 6) AS rrf_r
            FROM u GROUP BY doc_id
        """,
        "ucb_host_priority": """
            WITH hy AS (
              SELECT 'h' || CAST(doc_id % 30 AS VARCHAR) AS host,
                     CAST(SUM(CASE WHEN doc_id % 30 <> 7 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_fetches,
                     CAST(SUM(CASE WHEN doc_id % 30 <> 7
                                   THEN doc_id % 11 ELSE 0 END)
                          AS DOUBLE) AS yield_sum
              FROM documents GROUP BY 1
            ), tot AS (
              SELECT CAST(COALESCE(SUM(n_fetches), 0) AS DOUBLE) AS N FROM hy
            )
            SELECT host, n_fetches,
                   ROUND(CASE WHEN n_fetches > 0
                              THEN yield_sum / n_fetches END, 6)
                     AS mean_yield_r,
                   ROUND(CASE WHEN n_fetches > 0 AND N > 0
                              THEN yield_sum / n_fetches
                                   + sqrt(2) * sqrt(ln(N) / n_fetches)
                              END, 6) AS ucb_r,
                   n_fetches <= 0 AS explore
            FROM hy, tot
        """,
        "crawl_order_curve": """
            WITH base AS (
              SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
                     CAST((doc_id * 13) % 100 AS DOUBLE) AS v,
                     doc_id
              FROM documents
            ), led AS (
              SELECT 'bfs' AS ordering, url, v,
                     CAST(doc_id % 20 AS INT) AS tick FROM base
              UNION ALL
              SELECT 'greedy', url, v,
                     CAST(19 - floor(v / 5) AS INT) FROM base
            ), per AS (
              SELECT ordering, tick, COUNT(*) AS n_fetched, SUM(v) AS tv
              FROM led GROUP BY 1, 2
            )
            SELECT ordering, tick, n_fetched,
                   CAST(SUM(n_fetched) OVER w AS BIGINT) AS cum_fetched,
                   ROUND(SUM(tv) OVER w, 6) AS cum_value_r,
                   ROUND(CASE WHEN SUM(tv) OVER wt > 0
                              THEN SUM(tv) OVER w / (SUM(tv) OVER wt)
                              ELSE 0 END, 6) AS cum_value_frac_r
            FROM per
            WINDOW w AS (PARTITION BY ordering ORDER BY tick),
                   wt AS (PARTITION BY ordering ORDER BY tick
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
        """,
        "expected_freshness": """
            WITH lagged AS (
              SELECT user_id, epoch_us(ts) AS ts_us, event_type AS fp,
                     LAG(epoch_us(ts)) OVER w AS prev_ts,
                     LAG(event_type) OVER w AS prev_fp
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            per AS (
              SELECT user_id,
                     count(prev_ts) AS n_int,
                     CAST(SUM(CASE WHEN prev_fp IS NOT NULL AND fp <> prev_fp
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
                     AVG(CAST(ts_us - prev_ts AS DOUBLE)) / 1000000.0 AS mean_dt,
                     MAX(ts_us) AS last_us
              FROM lagged GROUP BY user_id),
            lam AS (
              SELECT user_id, last_us,
                     CASE WHEN n_int > 0 AND mean_dt > 0
                          THEN -ln((n_int - n_changes + 0.5) / (n_int + 0.5))
                               / mean_dt + 0.0
                          END AS lambda_per_s
              FROM per)
            SELECT user_id, lambda_per_s,
                   ROUND((1709251200000000 - last_us) / 1000000.0, 6) AS age_s,
                   ROUND(CASE WHEN lambda_per_s IS NOT NULL
                                   AND (1709251200000000 - last_us) >= 0
                              THEN exp(-lambda_per_s *
                                       ((1709251200000000 - last_us)
                                        / 1000000.0))
                              END, 6) AS freshness_r
            FROM lam
        """,
        "maxscore_topk": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ), dft AS (
              SELECT term, COUNT(*) AS df FROM post GROUP BY 1
            ), dl AS (
              SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1
            ), consts AS (
              SELECT (SELECT COUNT(*) FROM documents) AS n,
                     (SELECT COALESCE(SUM(tf), 0) FROM post) AS tot
            ), scored AS (
              SELECT p.doc_id,
                     ROUND(ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5))
                           * (p.tf * 2.2)
                           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl
                                            / (CAST(c.tot AS DOUBLE) / c.n))),
                           6) AS bm25_r
              FROM post p JOIN dft d USING (term) JOIN dl l USING (doc_id),
                   consts c
              WHERE p.term IN ('batch', 'dup')
            )
            SELECT doc_id, score_r, rank FROM (
              SELECT doc_id, ROUND(SUM(bm25_r), 6) AS score_r,
                     ROW_NUMBER() OVER (ORDER BY ROUND(SUM(bm25_r), 6) DESC,
                                        doc_id ASC) AS rank
              FROM scored GROUP BY doc_id) WHERE rank <= 10
        """,
        "fixed_chunk_dedup": """
            WITH base AS (
              SELECT text FROM documents
              WHERE length(COALESCE(text, '')) > 0
            ), expl AS (
              SELECT text,
                     unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT)))
                       AS i
              FROM base
            ), chunks AS (
              SELECT md5(substr(text, CAST(1 + i * 64 AS INT), 64)) AS h,
                     CAST(length(substr(text, CAST(1 + i * 64 AS INT), 64))
                          AS BIGINT) AS len
              FROM expl
            ), per AS (
              SELECT h, COUNT(*) AS copies, MIN(len) AS len
              FROM chunks GROUP BY 1
            )
            SELECT CAST(SUM(copies) AS BIGINT) AS total_chunks,
                   CAST(COUNT(*) AS BIGINT) AS distinct_chunks,
                   CAST(SUM(copies * len) AS BIGINT) AS total_chars,
                   CAST(SUM(len) AS BIGINT) AS distinct_chars,
                   ROUND(SUM(len) / CAST(SUM(copies * len) AS DOUBLE), 6)
                     AS dedup_ratio_r
            FROM per
        """,
        "heavy_hitter_hosts": """
            WITH keyed AS (
              SELECT CASE WHEN doc_id % 4 = 0 THEN 'hot-a.example'
                          WHEN doc_id % 4 = 1 THEN 'hot-b.example'
                          ELSE 'tail-' || source END AS host
              FROM documents
            ), tot AS (SELECT COUNT(*) AS n FROM keyed),
            cnts AS (SELECT host, COUNT(*) AS cnt FROM keyed GROUP BY 1)
            SELECT host, cnt,
                   ROUND(cnt / CAST(n AS DOUBLE), 6) AS frac_r
            FROM cnts, tot WHERE cnt * 7 > n
        """,
        "cms_host_counts": """
            WITH keyed AS (
              SELECT CASE WHEN doc_id % 4 = 0 THEN 'hot-a.example'
                          WHEN doc_id % 4 = 1 THEN 'hot-b.example'
                          ELSE 'tail-' || source END AS host
              FROM documents
            ), hashed AS (
              SELECT host, r,
                     CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || host),
                                          1, 8))::UBIGINT % 64 AS INT) AS bucket
              FROM keyed CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r)
            ), counters AS (
              SELECT r, bucket, COUNT(*) AS cnt FROM hashed GROUP BY 1, 2
            ), probes AS (
              SELECT DISTINCT host, r, bucket FROM hashed
            )
            SELECT p.host, MIN(c.cnt) AS est_cnt
            FROM probes p JOIN counters c ON p.r = c.r AND p.bucket = c.bucket
            GROUP BY 1
        """,
        "url_trap_guard": """
            WITH u AS (
              SELECT doc_id,
                     'https://h' || (doc_id % 5) || '.test' ||
                     CASE doc_id % 4
                       WHEN 0 THEN '/cal/' || (doc_id % 30 + 2000) || '/' ||
                                   (doc_id % 12 + 1) || '/' || (doc_id % 28 + 1)
                       WHEN 1 THEN '/a/b/a/b/a/b/p' || doc_id
                       WHEN 2 THEN '/search?k0=1&k1=1&k2=1&k3=1&k4=1&k5=1&k6=1&k7=1&k8=1&k9=' || doc_id
                       ELSE '/doc/' || doc_id
                     END AS url,
                     lpad(CAST(doc_id AS VARCHAR), 8, '0') AS seq
              FROM documents),
            parts AS (
              SELECT doc_id, url, seq,
                     regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1) AS host,
                     regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
                     regexp_extract(url, '\\?([^#]*)', 1) AS q
              FROM u),
            feat AS (
              SELECT doc_id, url, seq,
                     host || regexp_replace(regexp_replace(path, '[0-9a-fA-F]{8,}', 'H', 'g'),
                                            '[0-9]+', 'N', 'g') AS url_pattern,
                     list_filter(string_split(path, '/'), x -> x <> '') AS segs,
                     CASE WHEN q = '' THEN 0
                          ELSE len(list_filter(string_split(q, '&'), x -> x <> '')) END AS nq
              FROM parts),
            tagged AS (
              SELECT doc_id, url_pattern, seq,
                     CASE WHEN length(url) > 2048 THEN 'too_long'
                          WHEN len(segs) > 16 THEN 'too_many_segments'
                          WHEN nq > 8 THEN 'too_many_params'
                          WHEN len(list_filter(list_distinct(segs),
                                 s -> len(list_filter(segs, x -> x = s)) >= 3)) > 0
                            THEN 'repeated_segment'
                     END AS structural
              FROM feat),
            ranked AS (
              SELECT doc_id, url_pattern, structural,
                     ROW_NUMBER() OVER (PARTITION BY url_pattern, (structural IS NULL)
                                        ORDER BY seq) AS rk
              FROM tagged)
            SELECT doc_id, url_pattern,
                   COALESCE(structural,
                            CASE WHEN rk > 10 THEN 'pattern_cap' END) AS trap_reason
            FROM ranked
        """,
        "per_source_quota_topk": """
            SELECT source, doc_id, CAST(rk AS INT) AS quota_rank FROM (
              SELECT source, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY source
                                        ORDER BY n_chars DESC, doc_id) AS rk
              FROM documents) WHERE rk <= 5
        """,
        "strip_tracking_params": """
            SELECT doc_id,
                   'https://t.test/p/' || doc_id ||
                     CASE WHEN doc_id % 4 = 0 THEN '?utm_source=news&id=' || doc_id
                          WHEN doc_id % 4 = 1 THEN '?id=' || doc_id || '&gclid=x'
                          WHEN doc_id % 4 = 2 THEN ''
                          ELSE '?fbclid=f' || doc_id END AS url,
                   'https://t.test/p/' || doc_id ||
                     CASE WHEN doc_id % 4 = 0 THEN '?id=' || doc_id
                          WHEN doc_id % 4 = 1 THEN '?id=' || doc_id
                          ELSE '' END AS stripped
            FROM documents
        """,
        "clean_corpus": f"""
            WITH rep AS ({_REPETITION_SQL}),
            lang AS ({_lang_id_oracle()}),
            dups AS (
              SELECT doc_id,
                     ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              FROM documents)
            SELECT doc_id, reason IS NULL AS keep, reason AS drop_reason
            FROM (
              SELECT rep.doc_id,
                     CASE WHEN rep.n_words < 20 THEN 'too_short'
                          WHEN lang.lang_pred <> 'en' THEN 'lang'
                          WHEN rep.dup_word_frac > 0.6
                               OR rep.top_ngram_frac > 0.1 THEN 'repetition'
                          WHEN dups.rn > 1 THEN 'duplicate' END AS reason
              FROM rep JOIN lang USING (doc_id) JOIN dups USING (doc_id))
        """,
        "dup_clusters": """
            WITH RECURSIVE sym AS (
              SELECT doc_id AS a, (doc_id * 7 + 3) % 101 AS b
              FROM documents WHERE doc_id % 5 = 0
              UNION
              SELECT (doc_id * 7 + 3) % 101, doc_id
              FROM documents WHERE doc_id % 5 = 0),
            reach(a, b) AS (
              SELECT a, b FROM sym
              UNION
              SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a)
            SELECT a AS node, LEAST(a, MIN(b)) AS component
            FROM reach GROUP BY a
        """,
        "pagerank_2iter": """
            WITH e AS (
              SELECT doc_id AS s, (doc_id * 13 + 7) % 200 AS d FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 29 + 1) % 200 FROM documents WHERE doc_id % 2 = 0),
            nodes AS (
              SELECT DISTINCT node FROM (
                SELECT s AS node FROM e UNION ALL SELECT d FROM e)),
            od AS (SELECT s AS node, count(*) AS outdeg FROM e GROUP BY s),
            r0 AS (
              SELECT n.node, CAST(1.0 AS DOUBLE) AS rank, od.outdeg
              FROM nodes n LEFT JOIN od USING (node)),
            c1 AS (
              SELECT e.d AS node, SUM(r.rank / r.outdeg) AS in_sum
              FROM e JOIN r0 r ON r.node = e.s GROUP BY e.d),
            r1 AS (
              SELECT r0.node,
                     CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) * COALESCE(c1.in_sum, 0) AS rank,
                     r0.outdeg
              FROM r0 LEFT JOIN c1 USING (node)),
            c2 AS (
              SELECT e.d AS node, SUM(r.rank / r.outdeg) AS in_sum
              FROM e JOIN r1 r ON r.node = e.s GROUP BY e.d),
            r2 AS (
              SELECT r1.node,
                     CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) * COALESCE(c2.in_sum, 0) AS rank
              FROM r1 LEFT JOIN c2 USING (node))
            -- +1e-12 pre-round bias, mirroring the Spark side (exact
            -- x.5e-6 boundary values in the damped-rank arithmetic)
            SELECT node, ROUND(rank + 1e-12, 6) AS rank_r FROM r2
        """,
        # NFC: DuckDB's utf8proc vs Python's unicodedata must agree
        # byte-for-byte on the recomposition of the salted fragments.
        "unicode_nfc": """
            SELECT doc_id,
                   nfc_normalize(text ||
                     CASE CAST(doc_id % 3 AS INT)
                       WHEN 0 THEN ' Cafe' || chr(769)
                       WHEN 1 THEN ' A' || chr(778) || 'ngstro' || chr(776) || 'm'
                       ELSE ' ascii' END) AS nfc_text
            FROM documents
        """,
        # Repair must be an exact inverse of the cp1252 garble, so the
        # oracle is the UN-garbled salted text (pure concat).
        "mojibake_repair": """
            SELECT doc_id,
                   text || ' ' || chr(233) || chr(8212) || chr(8220) || 'ok'
                     AS fixed_text
            FROM documents
        """,
        # Concat-and-chunk packing: identical per-shard running sum +
        # chunk-span expansion in SQL. w = ws-token count + 1 EOD slot.
        "sequence_pack_chunks": """
            WITH d AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                          % 8 AS INT) AS shard,
                     len(list_filter(string_split_regex(trim(text), '\\s+'),
                                     x -> x <> '')) + 1 AS w
              FROM documents
            ), s AS (
              SELECT doc_id, shard, w,
                     CAST(SUM(w) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
              FROM d WHERE w > 0
            ), x AS (
              SELECT shard, doc_id, w, e - w AS st, e,
                     unnest(generate_series((e - w) // 256, (e - 1) // 256)) AS chunk
              FROM s
            )
            SELECT shard, chunk, doc_id,
                   greatest(st, chunk * 256) - st AS doc_offset,
                   greatest(st, chunk * 256) - chunk * 256 AS chunk_offset,
                   greatest(least(least(e, (chunk + 1) * 256), st + w - 1)
                            - greatest(st, chunk * 256), 0) AS piece_len
            FROM x
        """,
        "sequence_pack_stats": """
            WITH d AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                          % 8 AS INT) AS shard,
                     len(list_filter(string_split_regex(trim(text), '\\s+'),
                                     x -> x <> '')) + 1 AS w
              FROM documents
            ), s AS (
              SELECT doc_id, shard, w,
                     CAST(SUM(w) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
              FROM d WHERE w > 0
            ), x AS (
              SELECT shard, doc_id, w, e - w AS st, e,
                     unnest(generate_series((e - w) // 256, (e - 1) // 256)) AS chunk
              FROM s
            ), p AS (
              SELECT shard, chunk, doc_id,
                     greatest(least(least(e, (chunk + 1) * 256), st + w - 1)
                              - greatest(st, chunk * 256), 0) AS piece_len
              FROM x
            )
            SELECT shard,
                   MAX(chunk) + 1 AS n_chunks,
                   SUM(piece_len) AS content_tokens,
                   COUNT(DISTINCT doc_id) AS n_docs,
                   (MAX(chunk) + 1) * 256 - SUM(piece_len) AS overhead_tokens,
                   ROUND(SUM(piece_len) / ((MAX(chunk) + 1) * 256.0), 6) AS utilization_r
            FROM p GROUP BY shard
        """,
        "shard_manifest": """
            SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                        % 16 AS INT) AS shard,
                   COUNT(*) AS doc_count,
                   SUM(length(COALESCE(text, ''))) AS char_sum,
                   SUM(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                           || COALESCE(text, '')), 1, 8))::UBIGINT)
                     AS checksum
            FROM documents GROUP BY shard
        """,
        # Full NB train+score replay: same 80/20 split, same Lidstone
        # smoothing, same per-label unknown mass, same prior-only path
        # for gram-less docs, same (score DESC, label DESC) argmax.
        "nb_langid_train_score": """
            WITH train AS (
              SELECT lang AS label, substr(text, 1, 1000) AS head
              FROM documents WHERE doc_id % 10 < 8
            ), exploded AS (
              SELECT label, substr(head, CAST(i AS INT), 3) AS gram
              FROM (SELECT label, head,
                           unnest(generate_series(1, length(head) - 2)) AS i
                    FROM train WHERE length(head) >= 3)
            ), counts AS (
              SELECT label, gram, COUNT(*) AS c FROM exploded GROUP BY 1, 2
            ), vocab AS (
              SELECT COUNT(DISTINCT gram) AS v_all FROM counts
            ), denom_side AS (
              SELECT label, total + 0.5 * (v_all + 1) AS denom
              FROM (SELECT label, SUM(c) AS total FROM counts GROUP BY 1), vocab
            ), grams AS (
              SELECT c.label, c.gram, ln((c.c + 0.5) / d.denom) AS log_prob
              FROM counts c JOIN denom_side d USING (label)
            ), labels AS (
              SELECT ld.label,
                     ln(ld.docs / nd.n_docs) AS log_prior,
                     ln(0.5 / d.denom) AS unk_log_prob
              FROM (SELECT lang AS label, COUNT(*) AS docs
                    FROM documents WHERE doc_id % 10 < 8 GROUP BY 1) ld
              CROSS JOIN (SELECT COUNT(*) AS n_docs
                          FROM documents WHERE doc_id % 10 < 8) nd
              JOIN denom_side d USING (label)
            ), probe AS (
              SELECT doc_id, substr(text, 1, 1000) AS head
              FROM documents WHERE doc_id % 10 >= 8
            ), probe_grams AS (
              SELECT doc_id, substr(head, CAST(i AS INT), 3) AS gram
              FROM (SELECT doc_id, head,
                           unnest(generate_series(1, length(head) - 2)) AS i
                    FROM probe WHERE length(head) >= 3)
            ), per_label AS (
              SELECT pg.doc_id, l.label,
                     SUM(COALESCE(g.log_prob, l.unk_log_prob)) AS gram_ll
              FROM probe_grams pg
              CROSS JOIN labels l
              LEFT JOIN grams g ON g.gram = pg.gram AND g.label = l.label
              GROUP BY 1, 2
            ), scored AS (
              SELECT p.doc_id, l.label,
                     l.log_prior + COALESCE(pl.gram_ll, 0.0) AS score
              FROM probe p
              CROSS JOIN labels l
              LEFT JOIN per_label pl
                ON pl.doc_id = p.doc_id AND pl.label = l.label
            )
            SELECT doc_id, label AS pred_label, ROUND(score, 4) AS score_r
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                               ORDER BY score DESC, label DESC) AS rn
                  FROM scored)
            WHERE rn = 1
        """,
        # GROUPING(source, lang) shares Spark grouping_id()'s standard
        # bit encoding; all aggregates exact, sums cast back to BIGINT
        # (DuckDB SUM(BIGINT) widens to HUGEINT).
        "corpus_datacard": """
            WITH d AS (
              SELECT source, lang,
                     len(list_filter(string_split_regex(trim(text), '\\s+'),
                                     x -> x <> '')) AS n_tokens,
                     length(COALESCE(text, '')) AS n_chars
              FROM documents
            )
            SELECT COALESCE(source, '<all>') AS source,
                   COALESCE(lang, '<all>') AS lang,
                   GROUPING(source, lang) AS level,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars,
                   ROUND(AVG(n_tokens), 4) AS mean_tokens_r,
                   MAX(n_tokens) AS max_tokens,
                   CAST(SUM(CASE WHEN n_tokens < 32 THEN 1 ELSE 0 END) AS BIGINT)
                     AS short_docs,
                   CAST(SUM(CASE WHEN n_tokens > 1024 THEN 1 ELSE 0 END) AS BIGINT)
                     AS long_docs
            FROM d GROUP BY ROLLUP (source, lang)
        """,
        # plant -> profile -> hot-fp guard (16) -> pair census -> overlap
        "mirror_hosts": """
            WITH pages AS (
              SELECT source AS host,
                     ('0x' || substr(md5(text), 1, 8))::UBIGINT::BIGINT AS fp
              FROM documents
              UNION ALL
              SELECT source || '-m' AS host,
                     ('0x' || substr(md5(text), 1, 8))::UBIGINT::BIGINT AS fp
              FROM documents WHERE doc_id % 5 = 0
              UNION ALL
              SELECT DISTINCT host, 42 AS fp FROM (
                SELECT source AS host FROM documents
                UNION ALL
                SELECT source || '-m' FROM documents WHERE doc_id % 5 = 0)
            ), prof AS (
              SELECT DISTINCT host, fp FROM pages WHERE fp IS NOT NULL
            ), sizes AS (
              SELECT host, COUNT(*) AS size FROM prof GROUP BY 1
            ), quiet AS (
              SELECT p.host, p.fp FROM prof p
              JOIN (SELECT fp FROM prof GROUP BY fp HAVING COUNT(*) <= 16) k
                USING (fp)
            ), shared AS (
              SELECT a.host AS host_a, b.host AS host_b, COUNT(*) AS shared
              FROM quiet a JOIN quiet b ON a.fp = b.fp AND a.host < b.host
              GROUP BY 1, 2 HAVING COUNT(*) >= 3
            )
            SELECT host_a, host_b, shared,
                   sa.size AS size_a, sb.size AS size_b,
                   ROUND(shared / least(sa.size, sb.size), 4) AS overlap_r
            FROM shared
            JOIN sizes sa ON sa.host = host_a
            JOIN sizes sb ON sb.host = host_b
            WHERE ROUND(shared / least(sa.size, sb.size), 4) >= 0.5
        """,
        "soft404_screen": f"""
            WITH salted AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 11 = 0 THEN 404 ELSE 200 END AS status,
                     CASE WHEN doc_id % 7 = 0
                            THEN 'Sorry, Page Not Found. ' || text
                          WHEN doc_id % 7 = 1 THEN 'tiny landing page'
                          ELSE text END AS text
              FROM documents
            )
            SELECT doc_id,
                   regexp_matches(substr(COALESCE(text, ''), 1, 400),
                                  '{textqc.SOFT404_RE}') AS s404_phrase,
                   status = 200 AND
                     len(list_filter(string_split_regex(trim(COALESCE(text, '')),
                                                        '\\s+'),
                                     x -> x <> '')) <= 20 AS suspect_tiny,
                   status = 200 AND
                     regexp_matches(substr(COALESCE(text, ''), 1, 400),
                                    '{textqc.SOFT404_RE}') AS soft404
            FROM salted
        """,
        # full-outer join delta; presence tracked apart from the fp so
        # null fps (304 rows) compare null-safely
        "snapshot_diff": """
            WITH old AS (
              SELECT 'u' || doc_id AS k,
                     ('0x' || substr(md5(text), 1, 8))::UBIGINT::BIGINT AS old_fp,
                     TRUE AS in_old
              FROM documents
            ), new AS (
              SELECT 'u' || doc_id AS k,
                     CASE WHEN doc_id % 19 = 0 THEN NULL
                          ELSE ('0x' || substr(md5(
                                 CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                                      ELSE text END), 1, 8))::UBIGINT::BIGINT
                     END AS new_fp,
                     TRUE AS in_new
              FROM documents WHERE doc_id % 13 <> 0
              UNION ALL
              SELECT 'u' || (doc_id + 1000000),
                     ('0x' || substr(md5(text || ' new'), 1, 8))::UBIGINT::BIGINT,
                     TRUE
              FROM documents WHERE doc_id % 17 = 0
            )
            SELECT COALESCE(old.k, new.k) AS url_canon, old_fp, new_fp,
                   CASE WHEN in_old IS NULL THEN 'added'
                        WHEN in_new IS NULL THEN 'removed'
                        WHEN old_fp IS NOT DISTINCT FROM new_fp THEN 'unchanged'
                        ELSE 'changed' END AS verdict
            FROM old FULL OUTER JOIN new ON old.k = new.k
        """,
        # CC closure (recursive CTE) + terminal-preferring representative
        "url_alias_clusters": """
            WITH RECURSIVE e AS (
              SELECT 'u' || doc_id AS src, 'u' || (doc_id - 1) AS dst
              FROM documents WHERE doc_id % 4 <> 0
            ), sym AS (
              SELECT src AS a, dst AS b FROM e
              UNION
              SELECT dst, src FROM e
            ), reach(a, b) AS (
              SELECT a, b FROM sym
              UNION
              SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
            ), comp AS (
              SELECT a AS node, LEAST(a, MIN(b)) AS component
              FROM reach GROUP BY a
            ), nodes AS (
              SELECT c.node, c.component,
                     CASE WHEN d.node IS NULL THEN 0 ELSE 1 END AS defers
              FROM comp c
              LEFT JOIN (SELECT DISTINCT src AS node FROM e) d USING (node)
            ), reps AS (
              SELECT component, node AS canonical_url FROM (
                SELECT component, node,
                       ROW_NUMBER() OVER (PARTITION BY component
                                          ORDER BY defers, node) AS rn
                FROM nodes) WHERE rn = 1
            )
            SELECT n.node AS url, n.component, r.canonical_url,
                   n.node = r.canonical_url AS is_canonical
            FROM nodes n JOIN reps r USING (component)
        """,
        # general eTLD+1 rule in SQL (same suffix list), then the rollup
        "registered_domain_rollup": f"""
            WITH hosts AS (
              SELECT CASE
                       WHEN doc_id % 4 = 0
                         THEN 's' || (doc_id % 37) || '.megafarm.co.uk'
                       WHEN doc_id % 4 = 1
                         THEN 'blog' || (doc_id % 11) || '.farm.com'
                       WHEN doc_id % 4 = 2
                         THEN 'site' || doc_id || '.example.org'
                       ELSE '10.0.' || (doc_id % 200) || '.7'
                     END AS host
              FROM documents
            ), lab AS (
              SELECT host, lower(trim(host)) AS h,
                     string_split(lower(trim(host)), '.') AS ls
              FROM hosts
            ), rd AS (
              SELECT host,
                     CASE
                       WHEN regexp_matches(h, '^\\d{{1,3}}(\\.\\d{{1,3}}){{3}}$')
                            OR len(ls) <= 1 THEN h
                       WHEN len(ls) >= 3 AND list_contains(
                              {_sql_list(_MLS)},
                              ls[-2] || '.' || ls[-1])
                         THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
                       ELSE ls[-2] || '.' || ls[-1]
                     END AS domain
              FROM lab
            )
            SELECT domain, COUNT(DISTINCT host) AS n_hosts, COUNT(*) AS n_urls
            FROM rd GROUP BY domain
        """,
        # OPIC: 2 cash sweeps unrolled; dangling cash redistributed
        # uniformly (virtual-root shortcut), importance = hist + cash
        "opic_2sweep": """
            WITH e AS (
              SELECT doc_id AS s, (doc_id * 11 + 5) % 150 AS d FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 17 + 2) % 150
              FROM documents WHERE doc_id % 3 = 0
            ), nodes AS (
              SELECT DISTINCT node FROM (
                SELECT s AS node FROM e UNION ALL SELECT d FROM e)
            ), od AS (
              SELECT s AS node, COUNT(*) AS outdeg FROM e GROUP BY s
            ), nn AS (SELECT COUNT(*) AS n FROM nodes),
            s0 AS (
              SELECT n.node, CAST(1.0 AS DOUBLE) AS cash,
                     CAST(0.0 AS DOUBLE) AS hist, od.outdeg
              FROM nodes n LEFT JOIN od USING (node)
            ), c1 AS (
              SELECT e.d AS node, SUM(s.cash / s.outdeg) AS in_sum
              FROM e JOIN s0 s ON s.node = e.s GROUP BY e.d
            ), g1 AS (
              SELECT COALESCE(SUM(cash), 0) AS dang FROM s0 WHERE outdeg IS NULL
            ), s1 AS (
              SELECT s0.node,
                     COALESCE(c1.in_sum, 0) + g1.dang / nn.n AS cash,
                     s0.hist + s0.cash AS hist, s0.outdeg
              FROM s0 LEFT JOIN c1 USING (node), g1, nn
            ), c2 AS (
              SELECT e.d AS node, SUM(s.cash / s.outdeg) AS in_sum
              FROM e JOIN s1 s ON s.node = e.s GROUP BY e.d
            ), g2 AS (
              SELECT COALESCE(SUM(cash), 0) AS dang FROM s1 WHERE outdeg IS NULL
            ), s2 AS (
              SELECT s1.node,
                     COALESCE(c2.in_sum, 0) + g2.dang / nn.n AS cash,
                     s1.hist + s1.cash AS hist
              FROM s1 LEFT JOIN c2 USING (node), g2, nn
            )
            SELECT node, ROUND(hist + cash, 6) AS imp_r FROM s2
        """,
        # postings -> df -> smoothed idf -> top-3 per doc on the
        # ROUNDED score (cross-engine-deterministic window)
        "tfidf_top_terms": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ), dft AS (
              SELECT term, COUNT(*) AS df FROM post GROUP BY 1
            ), nn AS (SELECT COUNT(*) AS n FROM documents),
            scored AS (
              SELECT p.doc_id, p.term, p.tf,
                     ROUND(p.tf * (ln((nn.n + 1) / (d.df + 1)) + 1.0), 6)
                       AS tfidf_r
              FROM post p JOIN dft d USING (term), nn
            )
            SELECT doc_id, term, tf, tfidf_r, rank FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                           ORDER BY tfidf_r DESC, term ASC)
                          AS rank
              FROM scored) WHERE rank <= 3
        """,
        # HITS: 2 L1-normalized sweeps unrolled (hub0 = 1, so the first
        # raw authority is just the in-degree)
        "hits_2iter": """
            WITH e AS (
              SELECT doc_id AS s, (doc_id * 11 + 5) % 150 AS d FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 17 + 2) % 150
              FROM documents WHERE doc_id % 3 = 0
            ), nodes AS (
              SELECT DISTINCT node FROM (
                SELECT s AS node FROM e UNION ALL SELECT d FROM e)
            ),
            a1r AS (SELECT d AS node, CAST(COUNT(*) AS DOUBLE) AS raw
                    FROM e GROUP BY d),
            a1t AS (SELECT SUM(raw) AS tot FROM a1r),
            a1 AS (SELECT n.node, COALESCE(a1r.raw, 0) / a1t.tot AS auth
                   FROM nodes n LEFT JOIN a1r USING (node), a1t),
            h1r AS (SELECT e.s AS node, SUM(a1.auth) AS raw
                    FROM e JOIN a1 ON a1.node = e.d GROUP BY e.s),
            h1t AS (SELECT SUM(raw) AS tot FROM h1r),
            h1 AS (SELECT n.node, COALESCE(h1r.raw, 0) / h1t.tot AS hub
                   FROM nodes n LEFT JOIN h1r USING (node), h1t),
            a2r AS (SELECT e.d AS node, SUM(h1.hub) AS raw
                    FROM e JOIN h1 ON h1.node = e.s GROUP BY e.d),
            a2t AS (SELECT SUM(raw) AS tot FROM a2r),
            a2 AS (SELECT n.node, COALESCE(a2r.raw, 0) / a2t.tot AS auth
                   FROM nodes n LEFT JOIN a2r USING (node), a2t),
            h2r AS (SELECT e.s AS node, SUM(a2.auth) AS raw
                    FROM e JOIN a2 ON a2.node = e.d GROUP BY e.s),
            h2t AS (SELECT SUM(raw) AS tot FROM h2r),
            h2 AS (SELECT n.node, COALESCE(h2r.raw, 0) / h2t.tot AS hub
                   FROM nodes n LEFT JOIN h2r USING (node), h2t)
            SELECT h2.node, ROUND(h2.hub, 6) AS hub_r, ROUND(a2.auth, 6) AS auth_r
            FROM h2 JOIN a2 USING (node)
        """,
        # TrustRank: 2 damped sweeps, teleport confined to doc_id%50==0
        # seeds (d0 = 1/|S|), no dangling redistribution (same documented
        # simplification as pagerank_2iter)
        "trustrank_2iter": """
            WITH e AS (
              SELECT doc_id AS s, (doc_id * 11 + 5) % 150 AS d FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 17 + 2) % 150
              FROM documents WHERE doc_id % 3 = 0
            ), nodes AS (
              SELECT DISTINCT node FROM (
                SELECT s AS node FROM e UNION ALL SELECT d FROM e)
            ), seeds AS (
              SELECT doc_id AS node FROM documents WHERE doc_id % 50 = 0
            ), ns AS (SELECT COUNT(*) AS n FROM seeds),
            od AS (SELECT s AS node, COUNT(*) AS outdeg FROM e GROUP BY s),
            base AS (
              SELECT n.node, od.outdeg,
                     CASE WHEN sd.node IS NOT NULL THEN 1.0 / ns.n
                          ELSE 0.0 END AS d0
              FROM nodes n LEFT JOIN od USING (node)
                           LEFT JOIN seeds sd USING (node), ns
            ),
            t0 AS (SELECT node, d0 AS trust, outdeg, d0 AS dd0 FROM base),
            c1 AS (SELECT e.d AS node, SUM(t.trust / t.outdeg) AS in_sum
                   FROM e JOIN t0 t ON t.node = e.s GROUP BY e.d),
            t1 AS (SELECT t0.node,
                          0.15 * t0.dd0 + 0.85 * COALESCE(c1.in_sum, 0) AS trust,
                          t0.outdeg, t0.dd0
                   FROM t0 LEFT JOIN c1 USING (node)),
            c2 AS (SELECT e.d AS node, SUM(t.trust / t.outdeg) AS in_sum
                   FROM e JOIN t1 t ON t.node = e.s GROUP BY e.d),
            t2 AS (SELECT t1.node,
                          0.15 * t1.dd0 + 0.85 * COALESCE(c2.in_sum, 0) AS trust
                   FROM t1 LEFT JOIN c2 USING (node))
            -- +1e-12 pre-round bias, mirroring the Spark side (exact
            -- x.5e-6 boundary values: trust terms are 0.01*0.85^k/2^m)
            SELECT node, ROUND(trust + 1e-12, 6) AS trust_r FROM t2
        """,
        # BFS min-hop from the doc_id%100==0 seeds, depth-capped: the
        # recursive closure is bounded by depth < 3, MIN() collapses the
        # multiple paths
        "crawl_depth_bfs": """
            WITH RECURSIVE e AS (
              SELECT doc_id AS s, (doc_id * 11 + 5) % 150 AS d FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 17 + 2) % 150
              FROM documents WHERE doc_id % 3 = 0
            ), seeds AS (
              SELECT doc_id AS node FROM documents WHERE doc_id % 100 = 0
            ), r(node, depth) AS (
              SELECT node, 0 FROM seeds
              UNION ALL
              SELECT e.d, r.depth + 1 FROM r JOIN e ON e.s = r.node
              WHERE r.depth < 3
            )
            SELECT node, MIN(depth) AS depth FROM r GROUP BY node
        """,
        # BM25 (Lucene non-negative idf), query terms inlined, avgdl over
        # ALL docs (empty docs count as length 0); top-10 ranked on the
        # rounded total then doc_id
        "bm25_search": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ), dft AS (
              SELECT term, COUNT(*) AS df FROM post GROUP BY 1
            ), dl AS (
              SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1
            ), consts AS (
              SELECT (SELECT COUNT(*) FROM documents) AS n,
                     (SELECT COALESCE(SUM(tf), 0) FROM post) AS tot
            ), scored AS (
              SELECT p.doc_id,
                     ROUND(ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5))
                           * (p.tf * 2.2)
                           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl
                                            / (CAST(c.tot AS DOUBLE) / c.n))),
                           6) AS bm25_r
              FROM post p JOIN dft d USING (term) JOIN dl l USING (doc_id),
                   consts c
              WHERE p.term IN ('merge', 'spark', 'window')
            )
            SELECT doc_id, score_r, rank FROM (
              SELECT doc_id, ROUND(SUM(bm25_r), 6) AS score_r,
                     ROW_NUMBER() OVER (ORDER BY ROUND(SUM(bm25_r), 6) DESC,
                                        doc_id ASC) AS rank
              FROM scored GROUP BY doc_id) WHERE rank <= 10
        """,
        "zipf_fit": """
            WITH uni AS (
              SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                                               '([a-z0-9]+)', 1)) AS w
              FROM documents),
            census AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
            topk AS (
              SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rank
              FROM census ORDER BY c DESC, w ASC LIMIT 30),
            xy AS (
              SELECT ln(CAST(rank AS DOUBLE)) AS x,
                     ln(CAST(c AS DOUBLE)) AS y
              FROM topk),
            agg AS (
              SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x * x) AS sxx, sum(y * y) AS syy,
                     sum(x * y) AS sxy
              FROM xy)
            SELECT CAST(n AS BIGINT) AS n_terms,
                   CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0 THEN
                     round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                   END AS slope_r,
                   CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0 THEN
                     round((sy - ((n * sxy - sx * sy)
                                  / (n * sxx - sx * sx)) * sx) / n, 6)
                   END AS intercept_r,
                   CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0
                         AND (n * syy - sy * sy) > 0 THEN
                     round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                           / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                   END AS r2_r
            FROM agg
        """,
        "dhash_near_dups": """
            WITH imgs AS (
              SELECT doc_id AS img_id, doc_id // 2 AS k FROM documents),
            px AS (
              SELECT img_id,
                     list_transform(range(0, 288), p ->
                       (p * (k % 13 + 1) + k) % 256) AS v
              FROM imgs),
            bits AS (
              SELECT img_id, list_transform(range(0, 64), t ->
                CASE WHEN v[CAST((t // 8) * 2 * 18 + (t % 8) * 2 AS INT) + 1]
                        > v[CAST((t // 8) * 2 * 18 + ((t % 8) + 1) * 2
                            AS INT) + 1]
                     THEN 1 ELSE 0 END) AS b
              FROM px),
            bands AS (
              SELECT img_id, CAST(j AS INT) AS band,
                     CAST(list_sum(list_transform(range(0, 8), i ->
                       b[CAST(j * 8 + i AS INT) + 1] * (1 << CAST(7 - i AS INT))
                     )) AS INT) AS val
              FROM bits, range(0, 8) t(j)),
            hot AS (
              SELECT band, val FROM bands
              GROUP BY band, val HAVING count(*) > 2000),
            cold AS (
              SELECT b.img_id, b.band, b.val
              FROM bands b ANTI JOIN hot h USING (band, val)),
            cand AS (
              SELECT DISTINCT x.img_id AS id_a, y.img_id AS id_b
              FROM cold x JOIN cold y
                ON x.band = y.band AND x.val = y.val
               AND x.img_id < y.img_id),
            pairs AS (
              SELECT c.id_a, c.id_b,
                     CAST(list_sum(list_transform(range(1, 65), i ->
                       CASE WHEN x.b[CAST(i AS INT)] <> y.b[CAST(i AS INT)]
                            THEN 1 ELSE 0 END)) AS INT) AS hamming
              FROM cand c
              JOIN bits x ON x.img_id = c.id_a
              JOIN bits y ON y.img_id = c.id_b)
            SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 4
        """,
        "gpt2_bpe_encode_fixed": """
            WITH RECURSIVE merges(rank, ml, mr) AS (
              VALUES (0,'Ġ','t'),(1,'h','e'),(2,'Ġt','he'),(3,'a','b'),
                     (4,'l','e'),(5,'Ġt','ab'),(6,'Ġtab','le'),(7,'v','a'),
                     (8,'Ġ','va'),(9,'Ġva','l'),(10,'u','e'),(11,'Ġval','ue')
            ),
            docs AS (
              SELECT doc_id AS id, coalesce(text, '') AS t
              FROM documents
              WHERE regexp_matches(coalesce(text, ''), '^[ -~]*$')
                AND NOT regexp_matches(coalesce(text, ''), '  ')),
            -- RE2-compatible GPT-2 pattern: under the printable-ASCII /
            -- no-double-space guard the published \\s+(?!\\S) branch never
            -- fires, so dropping it splits identically
            docpre AS (
              SELECT id, u.p
              FROM docs, unnest(regexp_extract_all(t,
                '''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+| +'
              )) AS u(p)),
            -- byte->unicode remap degenerates to space->Ġ on ASCII text
            vocab AS (SELECT DISTINCT replace(p, ' ', 'Ġ') AS w FROM docpre),
            init AS (SELECT w, string_split(w, '') AS syms FROM vocab),
            enc AS (
              SELECT w, syms, 0 AS m FROM init
              UNION ALL
              SELECT w,
                     CASE WHEN pos IS NULL THEN syms
                          ELSE list_concat(list_concat(syms[1:pos-1],
                                 [syms[CAST(pos AS INT)]
                                  || syms[CAST(pos AS INT)+1]]),
                               syms[pos+2:]) END AS syms,
                     CASE WHEN pos IS NULL THEN m + 1 ELSE m END AS m
              FROM (
                SELECT e.w, e.syms, e.m,
                       list_filter(range(1, len(e.syms)),
                                   i -> e.syms[CAST(i AS INT)] = mg.ml
                                    AND e.syms[CAST(i AS INT) + 1] = mg.mr
                                   )[1] AS pos
                FROM enc e JOIN merges mg ON mg.rank = e.m
                WHERE e.m < 12)
            ),
            done AS (SELECT w, len(syms) AS n_tok FROM enc WHERE m = 12),
            perdoc AS (
              SELECT d.id, count(*) AS n_pretoks, sum(n_tok) AS n_tokens
              FROM docpre d JOIN done ON replace(d.p, ' ', 'Ġ') = done.w
              GROUP BY d.id)
            SELECT dd.id,
                   CAST(coalesce(p.n_pretoks, 0) AS INT) AS n_pretoks,
                   CAST(coalesce(p.n_tokens, 0) AS INT) AS n_tokens,
                   CASE WHEN coalesce(p.n_pretoks, 0) > 0
                        THEN round(p.n_tokens / p.n_pretoks, 4)
                        ELSE 0.0 END AS tokens_per_pretok
            FROM docs dd LEFT JOIN perdoc p ON dd.id = p.id
            ORDER BY dd.id
        """,
        "bpe_encode_fixed_merges": """
            WITH RECURSIVE merges(rank, ml, mr) AS (
              VALUES (0,'t','h'),(1,'th','e'),(2,'the','</w>'),(3,'e','</w>'),
                     (4,'a','n'),(5,'an','d'),(6,'and','</w>'),(7,'i','n')
            ),
            docs AS (
              SELECT doc_id AS id, lower(trim(coalesce(text, ''))) AS t
              FROM documents),
            docwords AS (
              SELECT id, u.w
              FROM docs, unnest(list_filter(regexp_split_to_array(t, '\\s+'),
                                            x -> x <> '')) AS u(w)),
            vocab AS (SELECT DISTINCT w FROM docwords),
            init AS (
              SELECT w, list_append(string_split(w, ''), '</w>') AS syms
              FROM vocab),
            enc AS (
              SELECT w, syms, 0 AS m FROM init
              UNION ALL
              SELECT w,
                     CASE WHEN pos IS NULL THEN syms
                          ELSE list_concat(list_concat(syms[1:pos-1],
                                 [syms[CAST(pos AS INT)]
                                  || syms[CAST(pos AS INT)+1]]),
                               syms[pos+2:]) END AS syms,
                     CASE WHEN pos IS NULL THEN m + 1 ELSE m END AS m
              FROM (
                SELECT e.w, e.syms, e.m,
                       list_filter(range(1, len(e.syms)),
                                   i -> e.syms[CAST(i AS INT)] = mg.ml
                                    AND e.syms[CAST(i AS INT) + 1] = mg.mr
                                   )[1] AS pos
                FROM enc e JOIN merges mg ON mg.rank = e.m
                WHERE e.m < 8)
            ),
            done AS (SELECT w, len(syms) AS n_tok FROM enc WHERE m = 8),
            perdoc AS (
              SELECT d.id, count(*) AS n_words, sum(n_tok) AS n_tokens
              FROM docwords d JOIN done ON d.w = done.w GROUP BY d.id)
            SELECT dd.id,
                   CAST(coalesce(p.n_words, 0) AS INT) AS n_words,
                   CAST(coalesce(p.n_tokens, 0) AS INT) AS n_tokens,
                   CASE WHEN coalesce(p.n_words, 0) > 0
                        THEN round(p.n_tokens / p.n_words, 4)
                        ELSE 0.0 END AS tokens_per_word
            FROM docs dd LEFT JOIN perdoc p ON dd.id = p.id
        """,
        "dhash_hot_band_census": """
            WITH imgs AS (
              SELECT doc_id AS img_id, doc_id // 2 AS k FROM documents),
            px AS (
              SELECT img_id,
                     list_transform(range(0, 288), p ->
                       (p * (k % 13 + 1) + k) % 256) AS v
              FROM imgs),
            bits AS (
              SELECT img_id, list_transform(range(0, 64), t ->
                CASE WHEN v[CAST((t // 8) * 2 * 18 + (t % 8) * 2 AS INT) + 1]
                        > v[CAST((t // 8) * 2 * 18 + ((t % 8) + 1) * 2
                            AS INT) + 1]
                     THEN 1 ELSE 0 END) AS b
              FROM px),
            bands AS (
              SELECT img_id, CAST(j AS INT) AS band,
                     CAST(list_sum(list_transform(range(0, 8), i ->
                       b[CAST(j * 8 + i AS INT) + 1] * (1 << CAST(7 - i AS INT))
                     )) AS INT) AS val
              FROM bits, range(0, 8) t(j)),
            hot AS (
              SELECT band, val, count(*) AS n FROM bands
              GROUP BY band, val HAVING count(*) > 100)
            SELECT band, count(*) AS hot_buckets,
                   sum(n) AS dropped_memberships
            FROM hot GROUP BY band ORDER BY band
        """,
        "collocations_pmi": """
            WITH toks AS (
              SELECT regexp_extract_all(lower(coalesce(text, '')),
                                        '([a-z0-9]+)', 1) AS t
              FROM documents),
            bg AS (
              SELECT unnest(list_transform(range(1, len(t)), i ->
                       struct_pack(w1 := t[CAST(i AS INT)],
                                   w2 := t[CAST(i AS INT) + 1]))) AS p
              FROM toks WHERE len(t) >= 2),
            bgf AS (SELECT p['w1'] AS w1, p['w2'] AS w2 FROM bg),
            big AS (
              SELECT w1, w2, count(*) AS c12 FROM bgf
              GROUP BY 1, 2 HAVING count(*) >= 5),
            uni AS (SELECT unnest(t) AS w FROM toks),
            unic AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
            tot AS (SELECT (SELECT count(*) FROM bgf) AS nb,
                           (SELECT count(*) FROM uni) AS nu)
            SELECT b.w1, b.w2, b.c12, u1.c AS c1, u2.c AS c2,
                   round(ln((b.c12 / t.nb)
                            / ((u1.c / t.nu) * (u2.c / t.nu))), 6) AS pmi_r
            FROM big b
            JOIN unic u1 ON u1.w = b.w1
            JOIN unic u2 ON u2.w = b.w2, tot t
        """,
        "readability_flesch": """
            WITH x AS (
              SELECT doc_id, lower(coalesce(text, '')) AS c FROM documents),
            w AS (
              SELECT doc_id,
                     regexp_extract_all(c, '([a-z]+)', 1) AS words,
                     greatest(1, len(regexp_extract_all(c, '([.!?]+)', 1)))
                       AS sent
              FROM x),
            s AS (
              SELECT doc_id, words, sent,
                     CAST(coalesce(list_sum(list_transform(words, t ->
                       greatest(1, len(regexp_extract_all(t,
                         '([aeiouy]+)', 1))))), 0) AS BIGINT) AS syl
              FROM w)
            SELECT doc_id,
                   CAST(len(words) AS INT) AS n_words,
                   CASE WHEN len(words) > 0 THEN CAST(sent AS INT)
                        ELSE 0 END AS n_sentences,
                   CASE WHEN len(words) > 0 THEN CAST(syl AS INT)
                        ELSE 0 END AS n_syllables,
                   CASE WHEN len(words) > 0 THEN
                     round(206.835 - 1.015 * (len(words) / sent)
                           - 84.6 * (syl / len(words)), 6)
                   END AS flesch_r
            FROM s
        """,
        "politeness_compliance": """
            WITH f AS (
              SELECT 'h' || CAST(user_id % 8 AS VARCHAR) AS host,
                     epoch_ms(ts) AS ms
              FROM events),
            g AS (
              SELECT host, ms,
                     ms - lag(ms) OVER (PARTITION BY host ORDER BY ms)
                       AS gap
              FROM f),
            d(host, crawl_delay_ms) AS (
              VALUES ('h0', 500), ('h1', 1000), ('h2', 1500), ('h3', 2000),
                     ('h4', 500), ('h5', 1000), ('h6', 1500), ('h7', 2000)),
            agg AS (
              SELECT g.host, d.crawl_delay_ms,
                     count(*) AS n_fetches,
                     min(gap) AS min_gap_ms,
                     CAST(SUM(CASE WHEN gap < d.crawl_delay_ms THEN 1
                              ELSE 0 END) AS BIGINT) AS n_violations
              FROM g LEFT JOIN d USING (host)
              GROUP BY g.host, d.crawl_delay_ms)
            SELECT host, n_fetches, min_gap_ms, crawl_delay_ms, n_violations,
                   n_violations = 0 AS compliant
            FROM agg
        """,
        "hreflang_reciprocity": """
            WITH base AS (SELECT doc_id AS d FROM documents),
            edges AS (
              SELECT 'u' || CAST(d AS VARCHAR) AS src, 'en' AS lang,
                     'u' || CAST(CASE WHEN d % 2 = 0 THEN d + 1
                                      ELSE d - 1 END AS VARCHAR) AS dst,
                     true AS reciprocal
              FROM base
              UNION ALL
              SELECT 'u' || CAST(d AS VARCHAR), 'fr',
                     'x' || CAST(d AS VARCHAR), false
              FROM base WHERE d % 5 = 0)
            SELECT src, lang, dst, reciprocal FROM edges
        """,
        "quantize_embeddings_int8": """
            WITH x AS (
              SELECT vec_id, embedding,
                     list_max(list_transform(embedding,
                       v -> abs(CAST(v AS DOUBLE)))) AS amax
              FROM embeddings)
            SELECT vec_id,
                   CAST(len(embedding) AS INT) AS dim,
                   round(amax / 127.0, 6) AS scale_r,
                   CASE WHEN amax > 0 THEN
                     array_to_string(list_transform(embedding, v ->
                       CAST(CAST(greatest(-127.0, least(127.0,
                         floor(CAST(v AS DOUBLE) / (amax / 127.0) + 0.5)))
                         AS INT) AS VARCHAR)), ',')
                   ELSE array_to_string(
                     list_transform(embedding, v -> '0'), ',') END AS qvec_s,
                   CASE WHEN amax > 0 THEN
                     round(list_max(list_transform(embedding, v ->
                       abs(CAST(v AS DOUBLE)
                           - greatest(-127.0, least(127.0,
                               floor(CAST(v AS DOUBLE) / (amax / 127.0)
                                     + 0.5)))
                             * (amax / 127.0)))), 6)
                   WHEN amax IS NOT NULL THEN 0.0 END AS max_abs_err_r
            FROM x
        """,
        "percolate_alerts": """
            WITH q(query_id, query) AS (
              VALUES (0, 'table part'), (1, 'fast scan'), (2, 'merge'),
                     (3, 'big data'), (4, 'slow join')),
            qt AS (
              SELECT query_id,
                     unnest(list_distinct(regexp_extract_all(
                       lower(query), '([a-z0-9]+)', 1))) AS term
              FROM q),
            qn AS (SELECT query_id, count(*) AS q_n FROM qt GROUP BY 1),
            tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(coalesce(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents),
            dt AS (SELECT doc_id, term FROM tok GROUP BY 1, 2),
            c AS (
              SELECT dt.doc_id, qt.query_id, count(*) AS n_terms
              FROM dt JOIN qt USING (term)
              GROUP BY 1, 2)
            SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
                   CAST(c.query_id AS BIGINT) AS query_id, c.n_terms
            FROM c JOIN qn USING (query_id)
            WHERE c.n_terms = qn.q_n
        """,
        "trending_event_types": """
            WITH counts AS (
              SELECT CAST(epoch(time_bucket(INTERVAL '60 minutes', ts))
                       AS BIGINT) AS window_start_epoch,
                     event_type AS term, count(*) AS n
              FROM events GROUP BY 1, 2),
            lifted AS (
              SELECT window_start_epoch, term, n,
                     CASE WHEN lag(window_start_epoch) OVER w
                               = window_start_epoch - 3600
                          THEN lag(n) OVER w END AS prev_n
              FROM counts
              WINDOW w AS (PARTITION BY term ORDER BY window_start_epoch))
            SELECT window_start_epoch, term, n, prev_n,
                   CASE WHEN prev_n IS NOT NULL
                        THEN round(CAST(n AS DOUBLE) / prev_n, 6)
                   END AS lift_r
            FROM lifted
        """,
        "host_url_space_estimate": """
            WITH c AS (
              SELECT DISTINCT 'h' || CAST(doc_id % 16 AS VARCHAR) AS host,
                     'u' || CAST(doc_id AS VARCHAR) AS u
              FROM documents WHERE doc_id % 3 <> 0),
            s AS (
              SELECT DISTINCT 'h' || CAST(doc_id % 16 AS VARCHAR) AS host,
                     'u' || CAST(doc_id AS VARCHAR) AS u
              FROM documents WHERE doc_id % 2 = 0),
            j AS (
              SELECT COALESCE(c.host, s.host) AS host,
                     c.u IS NOT NULL AS ic, s.u IS NOT NULL AS im
              FROM c FULL OUTER JOIN s
                ON c.host = s.host AND c.u = s.u),
            agg AS (
              SELECT host,
                     CAST(SUM(CASE WHEN im THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_listed,
                     CAST(SUM(CASE WHEN ic THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_crawled,
                     CAST(SUM(CASE WHEN ic AND im THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_both,
                     CAST(SUM(CASE WHEN 1=1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_union
              FROM j GROUP BY host)
            SELECT host, n_listed, n_crawled, n_both, n_union,
                   CASE WHEN n_both > 0 THEN
                     round((n_listed + 1.0) * (n_crawled + 1.0)
                           / (n_both + 1.0) - 1.0, 6) END AS chapman_est_r,
                   CASE WHEN n_both > 0 THEN
                     round(greatest((n_listed + 1.0) * (n_crawled + 1.0)
                                    / (n_both + 1.0) - 1.0 - n_union,
                                    0.0), 6) END AS undiscovered_est_r
            FROM agg
        """,
        "sitemap_coverage": """
            WITH c AS (
              SELECT DISTINCT 'h' || CAST(doc_id % 16 AS VARCHAR) AS host,
                     'u' || CAST(doc_id AS VARCHAR) AS u
              FROM documents WHERE doc_id % 3 <> 0),
            s AS (
              SELECT DISTINCT 'h' || CAST(doc_id % 16 AS VARCHAR) AS host,
                     'u' || CAST(doc_id AS VARCHAR) AS u
              FROM documents WHERE doc_id % 2 = 0),
            j AS (
              SELECT COALESCE(c.host, s.host) AS host,
                     c.u IS NOT NULL AS ic, s.u IS NOT NULL AS im
              FROM c FULL OUTER JOIN s
                ON c.host = s.host AND c.u = s.u),
            agg AS (
              SELECT host,
                     CAST(SUM(CASE WHEN im THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_listed,
                     CAST(SUM(CASE WHEN ic THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_crawled,
                     CAST(SUM(CASE WHEN ic AND im THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_both,
                     CAST(SUM(CASE WHEN ic AND NOT im THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_crawled_only,
                     CAST(SUM(CASE WHEN im AND NOT ic THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_listed_only
              FROM j GROUP BY host)
            SELECT host, n_listed, n_crawled, n_both, n_crawled_only,
                   n_listed_only,
                   CASE WHEN n_listed > 0
                        THEN round(CAST(n_both AS DOUBLE) / n_listed, 6)
                   END AS coverage_r
            FROM agg
        """,
        "robots_policy_diff": """
            SELECT 'h' || CAST(doc_id AS VARCHAR) AS host,
                   '/private/' || CAST(doc_id % 7 AS VARCHAR) || '/x' AS path,
                   (doc_id % 7) <> (doc_id % 3) AS allowed_old,
                   (doc_id % 7) <> (doc_id % 5) AS allowed_new,
                   CAST((doc_id % 4 + 1) * 1000 AS INT) AS crawl_delay_ms_old,
                   CAST((doc_id % 4 + 2) * 1000 AS INT) AS crawl_delay_ms_new,
                   CASE
                     WHEN (doc_id % 7) <> (doc_id % 3)
                      AND (doc_id % 7) <> (doc_id % 5) THEN 'still_allowed'
                     WHEN (doc_id % 7) <> (doc_id % 3)
                      AND (doc_id % 7) = (doc_id % 5) THEN 'newly_denied'
                     WHEN (doc_id % 7) = (doc_id % 3)
                      AND (doc_id % 7) <> (doc_id % 5) THEN 'newly_allowed'
                     ELSE 'still_denied'
                   END AS verdict
            FROM documents
        """,
        # the nb_langid_train_score train/score SQL, re-aimed at 12-token
        # windows of the held-out docs, plus the per-doc mixture rollup
        # (struct-max ties to the greatest label, same as Spark)
        # ground truth derived from the arithmetic html construction; the
        # Spark side must PARSE the synthesized tags (quote/case/junk
        # variants) to reproduce it
        "char_entropy": """
            WITH h AS (
              SELECT doc_id,
                     substr(COALESCE(text, ''), 1, 1000) AS head
              FROM documents
            ), c AS (
              SELECT doc_id, length(head) AS n,
                     list_distinct(string_split(head, '')) AS uniq,
                     string_split(head, '') AS chars
              FROM h
            )
            SELECT doc_id AS id, CAST(n AS INT) AS n_chars,
                   ROUND(CASE WHEN n > 0 THEN
                     -list_sum(list_transform(uniq,
                        u -> (CAST(len(list_filter(chars, x -> x = u))
                                   AS DOUBLE) / n)
                             * log2(CAST(len(list_filter(chars, x -> x = u))
                                         AS DOUBLE) / n)))
                   END, 6) AS entropy_r
            FROM c
        """,
        "cross_source_dups": """
            WITH salted AS (
              SELECT doc_id, source,
                     CASE WHEN doc_id % 4 = 0
                          THEN 'syndicated wire copy '
                               || CAST(doc_id % 5 AS VARCHAR)
                          ELSE text END AS text
              FROM documents
            ), census AS (
              SELECT COALESCE(text, '') AS t, source AS s, COUNT(*) AS n
              FROM salted GROUP BY 1, 2
            ), pairs AS (
              SELECT a.s AS sa, a.n AS na, b.s AS sb, b.n AS nb
              FROM census a JOIN census b ON a.t = b.t
              WHERE a.s <= b.s AND (a.s <> b.s OR a.n >= 2)
            )
            SELECT sa AS src_source, sb AS dst_source,
                   CAST(SUM(CASE WHEN sa = sb THEN na
                                 ELSE na + nb END) AS BIGINT)
                     AS n_shared_docs,
                   COUNT(*) AS n_groups
            FROM pairs GROUP BY 1, 2
        """,
        # ground truth from the planted-PAN construction: %5==0 valid,
        # ==1 Luhn-failing sibling, ==2 grouped valid; base text is
        # alphabetic so no stray digit runs
        "credit_card_signals": """
            SELECT doc_id,
                   CAST(CASE WHEN doc_id % 5 IN (0, 1, 2) THEN 1 ELSE 0 END
                        AS INT) AS n_cc_candidates,
                   CAST(CASE WHEN doc_id % 5 IN (0, 2) THEN 1 ELSE 0 END
                        AS INT) AS n_cc_valid
            FROM documents
        """,
        "bowtie_classes": """
            WITH RECURSIVE e AS (
              SELECT doc_id AS s, (doc_id * 11 + 5) % 150 AS d FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 17 + 2) % 150
              FROM documents WHERE doc_id % 3 = 0
            ), nodes AS (
              SELECT DISTINCT node FROM (
                SELECT s AS node FROM e UNION ALL SELECT d FROM e)
            ), deg AS (
              SELECT node, COUNT(*) AS dg FROM (
                SELECT s AS node FROM e UNION ALL SELECT d FROM e)
              GROUP BY 1
            ), pv AS (
              SELECT node FROM deg ORDER BY dg DESC, node DESC LIMIT 1
            ), fwd AS (
              SELECT node FROM pv
              UNION
              SELECT e.d AS node FROM e JOIN fwd ON e.s = fwd.node
            ), bwd AS (
              SELECT node FROM pv
              UNION
              SELECT e.s AS node FROM e JOIN bwd ON e.d = bwd.node
            )
            SELECT n.node,
                   CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL
                          THEN 'scc'
                        WHEN b.node IS NOT NULL THEN 'in'
                        WHEN f.node IS NOT NULL THEN 'out'
                        ELSE 'other' END AS cls
            FROM nodes n
            LEFT JOIN (SELECT DISTINCT node FROM fwd) f ON n.node = f.node
            LEFT JOIN (SELECT DISTINCT node FROM bwd) b ON n.node = b.node
        """,
        "amp_variant_pairs": """
            WITH base AS (
              SELECT doc_id,
                     's' || CAST(doc_id % 7 AS VARCHAR) || '.example/p'
                       || CAST(doc_id AS VARCHAR) AS base_key,
                     'https://s' || CAST(doc_id % 7 AS VARCHAR)
                       || '.example/p' || CAST(doc_id AS VARCHAR)
                       AS plain_url
              FROM documents
            )
            SELECT base_key, plain_url, plain_url || '/amp' AS amp_url
            FROM base WHERE doc_id % 3 = 0
            UNION ALL
            SELECT base_key, plain_url,
                   'https://amp.s' || CAST(doc_id % 7 AS VARCHAR)
                     || '.example/p' || CAST(doc_id AS VARCHAR) AS amp_url
            FROM base WHERE doc_id % 3 = 1
        """,
        # expected surfaces derived from the construction (text is already
        # lowercase; entity + whitespace collapse folded analytically)
        "title_consistency": """
            WITH b AS (
              SELECT doc_id,
                     trim(regexp_replace(
                       substr(COALESCE(text, ''), 1, 12) || ' & co',
                       '\\s+', ' ', 'g')) AS tt
              FROM documents
            )
            SELECT CAST(doc_id AS VARCHAR) AS id,
                   tt AS title,
                   CASE WHEN doc_id % 3 = 0 THEN tt END AS og_title,
                   CASE WHEN doc_id % 2 = 1 THEN 'different'
                        ELSE tt END AS h1,
                   doc_id % 3 = 0 AS title_eq_og,
                   doc_id % 2 = 0 AS title_eq_h1
            FROM b
        """,
        # the sequential single-window definition; Spark's two-level
        # bucketed prefix scan must reproduce it exactly
        "watermark_lateness": """
            WITH m AS (
              SELECT ts,
                     MAX(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS high
              FROM events
            ), f AS (
              SELECT ts,
                     high IS NOT NULL
                       AND ts < high - INTERVAL '10 minutes' AS late
              FROM m
            )
            SELECT date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n_events,
                   CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_late,
                   ROUND(CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END)
                              AS DOUBLE) / COUNT(*), 6) AS late_frac_r
            FROM f GROUP BY 1
        """,
        # verdicts derived from the 4-shape body construction; Spark must
        # run the real RFC 9309 parse + group selection to reproduce them
        "ai_crawler_policy": """
            WITH hosts AS (
              SELECT doc_id, 'h' || CAST(doc_id AS VARCHAR) AS host,
                     doc_id % 4 AS v
              FROM documents WHERE doc_id < 48
            ), agents(agent) AS (
              VALUES ('GPTBot'), ('ClaudeBot'), ('Google-Extended'),
                     ('CCBot'), ('Applebot-Extended')
            )
            SELECT h.host, a.agent,
                   CASE h.v
                     WHEN 0 THEN a.agent NOT IN ('GPTBot', 'ClaudeBot')
                     WHEN 1 THEN a.agent <> 'Google-Extended'
                     WHEN 2 THEN TRUE
                     ELSE a.agent = 'CCBot' END AS root_allowed,
                   CAST(CASE h.v
                     WHEN 0 THEN 1
                     WHEN 1 THEN CASE WHEN a.agent = 'Google-Extended'
                                      THEN 1 ELSE 0 END
                     WHEN 2 THEN 0
                     ELSE CASE WHEN a.agent = 'CCBot' THEN 0 ELSE 1 END
                   END AS INT) AS n_disallow,
                   CAST(CASE h.v
                     WHEN 0 THEN 0
                     WHEN 1 THEN CASE WHEN a.agent = 'Google-Extended'
                                      THEN 0 ELSE 1 END
                     WHEN 2 THEN 0
                     ELSE CASE WHEN a.agent = 'CCBot' THEN 1 ELSE 0 END
                   END AS INT) AS n_allow
            FROM hosts h CROSS JOIN agents a
        """,
        "rbp_err_eval": """
            WITH qs AS (SELECT doc_id AS q FROM documents WHERE doc_id < 10),
            res AS (
              SELECT q, (q*17 + r*13) % 200 AS d, r
              FROM qs, UNNEST(generate_series(1, 10)) AS t(r)),
            rels AS (
              SELECT q, dd.doc_id AS d, 1 + (dd.doc_id % 3) AS rel
              FROM qs, (SELECT doc_id FROM documents WHERE doc_id < 200) dd
              WHERE (dd.doc_id*7 + q*3) % 9 = 0),
            hits AS (
              SELECT res.q, res.r, COALESCE(rels.rel, 0) AS rel
              FROM res LEFT JOIN rels
                ON res.q = rels.q AND res.d = rels.d),
            pr AS (
              SELECT q, r, rel, (POW(2, rel) - 1) / 8.0 AS rp FROM hits),
            sv AS (
              SELECT q, r, rel, rp,
                     EXP(COALESCE(SUM(LN(1 - rp + 1e-300)) OVER (
                       PARTITION BY q ORDER BY r
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0)) AS surv
              FROM pr)
            SELECT q AS query_id,
                   ROUND(SUM(CASE WHEN rel > 0 THEN POW(0.8, r - 1)
                                  ELSE 0 END) * (1 - 0.8), 6) AS rbp_r,
                   ROUND(SUM(rp * surv / r), 6) AS err_r,
                   ROUND(POW(0.8, 10), 6) AS rbp_residual_r
            FROM sv GROUP BY q
        """,
        # chain structure derived from the triple construction: heads at
        # doc_id%3==0, tails at %3==2 or the dangling max-id page
        "pagination_chains": """
            WITH d AS (
              SELECT doc_id,
                     'u' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS url,
                     doc_id - (doc_id % 3) AS head
              FROM documents
            ), sizes AS (
              SELECT head, COUNT(*) AS n FROM d GROUP BY 1
            )
            SELECT url,
                   'u' || lpad(CAST(head AS VARCHAR), 6, '0') AS chain_id,
                   CAST(n AS BIGINT) AS n_pages,
                   doc_id % 3 = 0 AS is_head,
                   (doc_id % 3 = 2)
                     OR doc_id = (SELECT MAX(doc_id) FROM documents)
                     AS is_tail
            FROM d JOIN sizes USING (head)
        """,
        # expected rows derived from the arithmetic island construction
        "jsonld_entities": """
            SELECT doc_id AS id, 0 AS ld_idx,
                   'Article' AS ld_type, CAST(NULL AS VARCHAR) AS name,
                   substr(COALESCE(text, ''), 1, 20) AS headline,
                   CAST(NULL AS VARCHAR) AS date_published,
                   TRUE AS valid
            FROM documents
            UNION ALL
            SELECT doc_id, 1, NULL, NULL, NULL, NULL, FALSE
            FROM documents WHERE doc_id % 4 = 0
        """,
        # expected table rows derived from the arithmetic construction:
        # header row + (doc_id % 3 + 1) body rows + a second single-cell
        # table on every 4th doc
        "html_tables": """
            SELECT doc_id AS id, 0 AS table_idx, 0 AS row_idx,
                   'Name|Qty' AS cells_joined, 2 AS n_cells, TRUE AS header
            FROM documents
            UNION ALL
            SELECT doc_id, 0, i,
                   'v ' || doc_id || '_' || i || '|'
                        || (doc_id * 10 + i) || ' & up',
                   2, FALSE
            FROM documents, (VALUES (1), (2), (3)) AS r(i)
            WHERE doc_id % 3 + 1 >= i
            UNION ALL
            SELECT doc_id, 1, 0, 'only', 1, FALSE
            FROM documents WHERE doc_id % 4 = 0
        """,
        "og_properties": """
            SELECT doc_id AS id, 0 AS og_idx, 'og:title' AS prop,
                   substr(COALESCE(text, ''), 1, 15) AS content
            FROM documents
            UNION ALL
            SELECT doc_id, 1, 'og:type', 'article'
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT doc_id, 2, 'og:image', 'https://x.example/i.png'
            FROM documents WHERE doc_id % 3 = 0
        """,
        # the oracle brute-forces with a full cross join + levenshtein —
        # the SymSpell delete-join must produce the identical answer
        "symspell_suggestions": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id FROM tok GROUP BY 1, 2
            ), dft AS (
              SELECT term, COUNT(*) AS df FROM post GROUP BY 1
            ), q(query_term) AS (
              VALUES ('spark'), ('sparkk'), ('windo'), ('tble'), ('zzz')
            ), cand AS (
              SELECT q.query_term, d.term, d.df,
                     CAST(levenshtein(q.query_term, d.term) AS INT) AS dist
              FROM q CROSS JOIN dft d
              WHERE levenshtein(q.query_term, d.term) <= 1
            )
            SELECT query_term, term, df, dist, rank FROM (
              SELECT *, CAST(ROW_NUMBER() OVER (
                PARTITION BY query_term
                ORDER BY dist ASC, df DESC, term ASC) AS INT) AS rank
              FROM cand)
            WHERE rank <= 3
        """,
        # PARKED_RE inlined verbatim (ASCII alternation, (?i)+\\b: Java ≡ RE2)
        "parked_screen": """
            WITH salted AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 6 = 0
                          THEN 'This domain is for sale. Sponsored listings below.'
                          WHEN doc_id % 6 = 1
                          THEN 'A long read about domain parking economics. '
                               || COALESCE(text, '')
                          ELSE text END AS text
              FROM documents
            ), f AS (
              SELECT doc_id, COALESCE(text, '') AS body FROM salted
            )
            SELECT doc_id,
                   regexp_matches(body,
                     '(?i)\\b(this domain (is|may be) for sale|buy this domain|domain (is )?parked|parked free|domain parking|related searches|sponsored listings|this (web ?page|domain) was parked|renew(ing)? this domain|interested in this domain)\\b')
                     AS parked_phrase,
                   len(list_filter(string_split_regex(trim(body), '\\s+'),
                                   x -> x <> '')) <= 40 AS suspect_tiny,
                   regexp_matches(body,
                     '(?i)\\b(this domain (is|may be) for sale|buy this domain|domain (is )?parked|parked free|domain parking|related searches|sponsored listings|this (web ?page|domain) was parked|renew(ing)? this domain|interested in this domain)\\b')
                   AND len(list_filter(string_split_regex(trim(body), '\\s+'),
                                       x -> x <> '')) <= 40 AS parked
            FROM f
        """,
        "temperature_mixture": """
            WITH avail AS (
              SELECT source, SUM(n_chars) AS tokens_available
              FROM documents GROUP BY 1
            ), w AS (
              SELECT source, tokens_available,
                     CASE WHEN tokens_available > 0
                          THEN POWER(CAST(tokens_available AS DOUBLE), 0.3)
                          ELSE 0.0 END AS wv
              FROM avail
            ), t AS (SELECT SUM(wv) AS tw FROM w), r AS (
              SELECT source, CAST(tokens_available AS BIGINT)
                       AS tokens_available, wv, tw,
                     CASE WHEN tokens_available > 0 AND tw > 0
                          THEN wv / tw * 50000 / tokens_available
                          ELSE 0.0 END AS raw
              FROM w, t
            )
            SELECT source, tokens_available,
                   ROUND(CASE WHEN tw > 0 THEN wv / tw ELSE 0.0 END, 6)
                     AS share_r,
                   ROUND(CASE WHEN tw > 0 THEN wv / tw * 50000
                              ELSE 0.0 END, 2) AS target_tokens,
                   raw > 2.0 AS capped,
                   ROUND(LEAST(raw, 2.0), 6) AS sample_rate,
                   CAST(ROUND(tokens_available
                              * ROUND(LEAST(raw, 2.0), 6), 0) AS BIGINT)
                     AS planned_tokens
            FROM r
        """,
        "reshard_move_stats": """
            WITH scores AS (
              SELECT doc_id, g.grp, sh.s,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                              || ':' || sh.s), 1, 8))::UBIGINT
                          AS BIGINT) AS h
              FROM documents
              CROSS JOIN (VALUES ('before'), ('after')) g(grp)
              CROSS JOIN (VALUES ('s-a'), ('s-b'), ('s-c'), ('s-d')) sh(s)
              WHERE NOT (g.grp = 'before' AND sh.s = 's-d')
            ), pick AS (
              SELECT doc_id, grp, s FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY doc_id, grp
                  ORDER BY h DESC, s DESC) AS rn
                FROM scores) WHERE rn = 1
            ), hrw AS (
              SELECT doc_id,
                     MAX(CASE WHEN grp = 'before' THEN s END) AS hb,
                     MAX(CASE WHEN grp = 'after' THEN s END) AS ha
              FROM pick GROUP BY doc_id
            ), withmod AS (
              SELECT doc_id, hb, ha,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                          1, 8))::UBIGINT % 1000003
                          AS BIGINT) AS bk
              FROM hrw
            ), flags AS (
              SELECT CASE WHEN bk % 3 <> bk % 4 THEN 1 ELSE 0 END AS modm,
                     CASE WHEN hb <> ha THEN 1 ELSE 0 END AS hrwm,
                     CASE WHEN hb <> ha AND ha = 's-d' THEN 1 ELSE 0 END
                       AS tonew
              FROM withmod
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                   ROUND(AVG(CAST(modm AS DOUBLE)), 6) AS mod_moved_r,
                   ROUND(AVG(CAST(hrwm AS DOUBLE)), 6) AS hrw_moved_r,
                   ROUND(CASE WHEN SUM(hrwm) > 0
                              THEN CAST(SUM(tonew) AS DOUBLE) / SUM(hrwm)
                         END, 6) AS hrw_moved_to_new_r
            FROM flags
        """,
        # expected sections derived from the arithmetic construction (body
        # text has no tags/entities); Spark must parse the synthesized
        # heading tags — incl. the <head><title> trap and the &amp; entity
        "section_chunks": """
            WITH base AS (
              SELECT doc_id, COALESCE(text, '') AS t FROM documents
            ), parts AS (
              SELECT doc_id,
                     trim(regexp_replace(substr(t, 1, 40),
                                         '\\s+', ' ', 'g')) AS s0,
                     trim(regexp_replace(substr(t, 41, 60),
                                         '\\s+', ' ', 'g')) AS s1,
                     trim(regexp_replace(substr(t, 101, 100000),
                                         '\\s+', ' ', 'g')) AS s2
              FROM base
            ), u AS (
              SELECT doc_id AS id, 0 AS sec_idx, CAST(NULL AS INT) AS level,
                     CAST(NULL AS VARCHAR) AS heading, s0 AS sec_text
              FROM parts WHERE s0 <> ''
              UNION ALL
              SELECT doc_id, 1, 1,
                     'Part ' || CAST(doc_id % 5 AS VARCHAR), s1
              FROM parts
              UNION ALL
              SELECT doc_id, 2, 2, 'Deep & Wide', s2 FROM parts
            )
            SELECT id, sec_idx, level, heading, sec_text,
                   CASE WHEN sec_text = '' THEN 0
                        ELSE len(string_split_regex(sec_text, '\\s+'))
                   END AS n_words
            FROM u
        """,
        "ai_optout_screen": """
            SELECT doc_id,
                   doc_id % 6 = 0 AS noai,
                   doc_id % 6 IN (0, 1) AS noimageai,
                   doc_id % 6 = 2 AS tdm_reserved,
                   NOT (doc_id % 6 = 0 OR doc_id % 6 = 2) AS trainable
            FROM documents
        """,
        "comb_fusion": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ), dft AS (
              SELECT term, COUNT(*) AS df FROM post GROUP BY 1
            ), dl AS (
              SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1
            ), consts AS (
              SELECT (SELECT COUNT(*) FROM documents) AS n,
                     (SELECT COALESCE(SUM(tf), 0) FROM post) AS tot
            ), bscored AS (
              SELECT p.doc_id,
                     ROUND(ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5))
                           * (p.tf * 2.2)
                           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl
                                            / (CAST(c.tot AS DOUBLE) / c.n))),
                           6) AS bm25_r
              FROM post p JOIN dft d USING (term) JOIN dl l USING (doc_id),
                   consts c
              WHERE p.term IN ('batch', 'dup')
            ), atop AS (
              SELECT doc_id, score_r FROM (
                SELECT doc_id, ROUND(SUM(bm25_r), 6) AS score_r,
                       ROW_NUMBER() OVER (ORDER BY ROUND(SUM(bm25_r), 6) DESC,
                                          doc_id ASC) AS rank
                FROM bscored GROUP BY doc_id) WHERE rank <= 50
            ), ctot AS (
              SELECT CAST(COALESCE(SUM(tf), 0) AS DOUBLE) AS ctot FROM post
            ), known AS (
              SELECT term, SUM(tf) / t.ctot AS ptc
              FROM post, ctot t WHERE term IN ('batch', 'dup')
              GROUP BY term, t.ctot
            ), cand AS (
              SELECT DISTINCT p.doc_id, l.dl
              FROM post p JOIN dl l USING (doc_id)
              WHERE p.term IN ('batch', 'dup')
            ), grid AS (
              SELECT c.doc_id, c.dl, k.term, k.ptc FROM cand c, known k
            ), qscored AS (
              SELECT g.doc_id,
                     ln((COALESCE(p.tf, 0) + 2000.0 * g.ptc)
                        / (g.dl + 2000.0)) AS s
              FROM grid g LEFT JOIN post p
                ON p.doc_id = g.doc_id AND p.term = g.term
            ), btop AS (
              SELECT doc_id, score_r FROM (
                SELECT doc_id, ROUND(SUM(s), 6) AS score_r,
                       ROW_NUMBER() OVER (ORDER BY ROUND(SUM(s), 6) DESC,
                                          doc_id ASC) AS rank
                FROM qscored GROUP BY doc_id) WHERE rank <= 50
            ), na AS (
              SELECT doc_id,
                     CASE WHEN m.mx > m.mn
                          THEN (score_r - m.mn) / (m.mx - m.mn)
                          ELSE 1.0 END AS nv
              FROM atop, (SELECT MIN(score_r) AS mn, MAX(score_r) AS mx
                          FROM atop) m
            ), nb AS (
              SELECT doc_id,
                     CASE WHEN m.mx > m.mn
                          THEN (score_r - m.mn) / (m.mx - m.mn)
                          ELSE 1.0 END AS nv
              FROM btop, (SELECT MIN(score_r) AS mn, MAX(score_r) AS mx
                          FROM btop) m
            ), u AS (
              SELECT * FROM na UNION ALL SELECT * FROM nb
            )
            SELECT doc_id, CAST(COUNT(*) AS INT) AS n_lists,
                   ROUND(SUM(nv), 6) AS combsum_r,
                   ROUND(SUM(nv) * COUNT(*), 6) AS combmnz_r
            FROM u GROUP BY doc_id
        """,
        "ranking_agreement": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ), dft AS (
              SELECT term, COUNT(*) AS df FROM post GROUP BY 1
            ), dl AS (
              SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1
            ), consts AS (
              SELECT (SELECT COUNT(*) FROM documents) AS n,
                     (SELECT COALESCE(SUM(tf), 0) FROM post) AS tot
            ), bscored AS (
              SELECT p.doc_id,
                     ROUND(ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5))
                           * (p.tf * 2.2)
                           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl
                                            / (CAST(c.tot AS DOUBLE) / c.n))),
                           6) AS bm25_r
              FROM post p JOIN dft d USING (term) JOIN dl l USING (doc_id),
                   consts c
              WHERE p.term IN ('batch', 'dup')
            ), atop AS (
              SELECT doc_id, score_r FROM (
                SELECT doc_id, ROUND(SUM(bm25_r), 6) AS score_r,
                       ROW_NUMBER() OVER (ORDER BY ROUND(SUM(bm25_r), 6) DESC,
                                          doc_id ASC) AS rank
                FROM bscored GROUP BY doc_id) WHERE rank <= 50
            ), ctot AS (
              SELECT CAST(COALESCE(SUM(tf), 0) AS DOUBLE) AS ctot FROM post
            ), known AS (
              SELECT term, SUM(tf) / t.ctot AS ptc
              FROM post, ctot t WHERE term IN ('batch', 'dup')
              GROUP BY term, t.ctot
            ), cand AS (
              SELECT DISTINCT p.doc_id, l.dl
              FROM post p JOIN dl l USING (doc_id)
              WHERE p.term IN ('batch', 'dup')
            ), grid AS (
              SELECT c.doc_id, c.dl, k.term, k.ptc FROM cand c, known k
            ), qscored AS (
              SELECT g.doc_id,
                     ln((COALESCE(p.tf, 0) + 2000.0 * g.ptc)
                        / (g.dl + 2000.0)) AS s
              FROM grid g LEFT JOIN post p
                ON p.doc_id = g.doc_id AND p.term = g.term
            ), btop AS (
              SELECT doc_id, score_r FROM (
                SELECT doc_id, ROUND(SUM(s), 6) AS score_r,
                       ROW_NUMBER() OVER (ORDER BY ROUND(SUM(s), 6) DESC,
                                          doc_id ASC) AS rank
                FROM qscored GROUP BY doc_id) WHERE rank <= 50
            ), j AS (
              SELECT a.doc_id AS id, a.score_r AS sa, b.score_r AS sb
              FROM atop a JOIN btop b USING (doc_id)
            ), rna AS (
              SELECT id, sa, ROW_NUMBER() OVER (ORDER BY sa DESC) AS rn
              FROM j
            ), ara AS (SELECT sa, AVG(rn) AS ra FROM rna GROUP BY sa),
            ja AS (SELECT id, ra FROM rna JOIN ara USING (sa)),
            rnb AS (
              SELECT id, sb, ROW_NUMBER() OVER (ORDER BY sb DESC) AS rn
              FROM j
            ), arb AS (SELECT sb, AVG(rn) AS rb FROM rnb GROUP BY sb),
            jb AS (SELECT id, rb FROM rnb JOIN arb USING (sb)),
            xy AS (SELECT ja.ra, jb.rb FROM ja JOIN jb USING (id)),
            mom AS (
              SELECT COUNT(*) AS n, SUM(ra) AS sx, SUM(rb) AS sy,
                     SUM(ra * ra) AS sxx, SUM(rb * rb) AS syy,
                     SUM(ra * rb) AS sxy
              FROM xy
            ), pr AS (
              SELECT sign(l.sa - r.sa) AS da, sign(l.sb - r.sb) AS db
              FROM j l JOIN j r ON l.id < r.id
            ), kt AS (
              SELECT
                COALESCE(SUM(CASE WHEN da * db > 0 THEN 1 ELSE 0 END), 0) AS c,
                COALESCE(SUM(CASE WHEN da * db < 0 THEN 1 ELSE 0 END), 0) AS d,
                COALESCE(SUM(CASE WHEN da = 0 AND db <> 0
                                  THEN 1 ELSE 0 END), 0) AS tx,
                COALESCE(SUM(CASE WHEN db = 0 AND da <> 0
                                  THEN 1 ELSE 0 END), 0) AS ty
              FROM pr
            )
            SELECT CAST(m.n AS BIGINT) AS n,
                   ROUND(CASE WHEN m.n >= 2
                                   AND m.n * m.sxx - m.sx * m.sx > 0
                                   AND m.n * m.syy - m.sy * m.sy > 0
                              THEN (m.n * m.sxy - m.sx * m.sy)
                                   / sqrt((m.n * m.sxx - m.sx * m.sx)
                                          * (m.n * m.syy - m.sy * m.sy))
                         END, 6) AS spearman_r,
                   ROUND(CASE WHEN k.c + k.d + k.tx > 0
                                   AND k.c + k.d + k.ty > 0
                              THEN (k.c - k.d)
                                   / sqrt(CAST((k.c + k.d + k.tx)
                                               * (k.c + k.d + k.ty)
                                          AS DOUBLE))
                         END, 6) AS kendall_r
            FROM mom m, kt k
        """,
        "allocation_fairness": """
            WITH alloc AS (
              SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY 1
            ), r AS (
              SELECT c, ROW_NUMBER() OVER (ORDER BY c, k) AS rk FROM alloc
            ), a AS (
              SELECT COUNT(*) AS n, SUM(c) AS t, SUM(rk * c) AS ranked,
                     SUM(c * c) AS sumsq, MAX(c) AS cmax
              FROM r
            )
            SELECT CAST(n AS BIGINT) AS n_keys, CAST(t AS BIGINT) AS total,
                   ROUND(2.0 * ranked / (n * t) - (n + 1.0) / n, 6)
                     AS gini_r,
                   ROUND(CAST(sumsq AS DOUBLE) / (t * t), 6) AS hhi_r,
                   ROUND(CAST(cmax AS DOUBLE) / t, 6) AS top_share_r
            FROM a
        """,
        "vocab_richness": """
            WITH tok AS (
              SELECT source,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS w
              FROM documents
            ), census AS (
              SELECT source, w, COUNT(*) AS c FROM tok GROUP BY 1, 2
            ), a AS (
              SELECT source,
                     SUM(c) AS n_tokens,
                     COUNT(*) AS v_types,
                     SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
                     SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
              FROM census GROUP BY 1
            )
            SELECT source, n_tokens, v_types, f1, f2,
                   round(v_types + CAST(f1 AS DOUBLE) * (f1 - 1)
                         / (2.0 * (f2 + 1)), 6) AS chao1_r,
                   round(CAST(f1 AS DOUBLE) / n_tokens, 6) AS unseen_mass_r,
                   round(1.0 - CAST(f1 AS DOUBLE) / n_tokens, 6) AS coverage_r
            FROM a
        """,
        "heaps_fit": """
            WITH tok AS (
              SELECT source,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS w
              FROM documents
            ), census AS (
              SELECT source, w, COUNT(*) AS c FROM tok GROUP BY 1, 2
            ), points AS (
              SELECT source, SUM(c) AS n_tok, COUNT(*) AS v
              FROM census GROUP BY 1
            ), xy AS (
              SELECT ln(CAST(n_tok AS DOUBLE)) AS x,
                     ln(CAST(v AS DOUBLE)) AS y
              FROM points
            ), a AS (
              SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x * x) AS sxx, SUM(y * y) AS syy,
                     SUM(x * y) AS sxy
              FROM xy
            )
            SELECT CAST(n AS BIGINT) AS n_points,
                   ROUND(CASE WHEN n >= 2 AND n * sxx - sx * sx > 1e-9 * n * sxx
                              THEN (n * sxy - sx * sy)
                                   / (n * sxx - sx * sx) END, 6) AS beta_r,
                   ROUND(CASE WHEN n >= 2 AND n * sxx - sx * sx > 1e-9 * n * sxx
                              THEN (sy - (n * sxy - sx * sy)
                                         / (n * sxx - sx * sx) * sx) / n
                         END, 6) AS lnk_r,
                   ROUND(CASE WHEN n >= 2 AND n * sxx - sx * sx > 1e-9 * n * sxx
                                   AND n * syy - sy * sy > 1e-9 * n * syy
                              THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
                                   / ((n * sxx - sx * sx)
                                      * (n * syy - sy * sy)) END, 6) AS r2_r
            FROM a
        """,
        "salsa_2sweep": """
            WITH e AS (
              SELECT doc_id AS s, (doc_id * 11 + 5) % 150 AS d FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 17 + 2) % 150
              FROM documents WHERE doc_id % 3 = 0
            ), nodes AS (
              SELECT DISTINCT node FROM (
                SELECT s AS node FROM e UNION ALL SELECT d FROM e)
            ),
            od AS (SELECT s, COUNT(*) AS od FROM e GROUP BY 1),
            ind AS (SELECT d, COUNT(*) AS indeg FROM e GROUP BY 1),
            a1r AS (SELECT e.d AS node, SUM(1.0 / od.od) AS raw
                    FROM e JOIN od USING (s) GROUP BY e.d),
            a1t AS (SELECT SUM(raw) AS tot FROM a1r),
            a1 AS (SELECT n.node, COALESCE(a1r.raw, 0) / a1t.tot AS auth
                   FROM nodes n LEFT JOIN a1r USING (node), a1t),
            h1r AS (SELECT e.s AS node, SUM(a1.auth / ind.indeg) AS raw
                    FROM e JOIN a1 ON a1.node = e.d JOIN ind USING (d)
                    GROUP BY e.s),
            h1t AS (SELECT SUM(raw) AS tot FROM h1r),
            h1 AS (SELECT n.node, COALESCE(h1r.raw, 0) / h1t.tot AS hub
                   FROM nodes n LEFT JOIN h1r USING (node), h1t),
            a2r AS (SELECT e.d AS node, SUM(h1.hub / od.od) AS raw
                    FROM e JOIN h1 ON h1.node = e.s JOIN od USING (s)
                    GROUP BY e.d),
            a2t AS (SELECT SUM(raw) AS tot FROM a2r),
            a2 AS (SELECT n.node, COALESCE(a2r.raw, 0) / a2t.tot AS auth
                   FROM nodes n LEFT JOIN a2r USING (node), a2t),
            h2r AS (SELECT e.s AS node, SUM(a2.auth / ind.indeg) AS raw
                    FROM e JOIN a2 ON a2.node = e.d JOIN ind USING (d)
                    GROUP BY e.s),
            h2t AS (SELECT SUM(raw) AS tot FROM h2r),
            h2 AS (SELECT n.node, COALESCE(h2r.raw, 0) / h2t.tot AS hub
                   FROM nodes n LEFT JOIN h2r USING (node), h2t)
            SELECT h2.node, ROUND(h2.hub, 6) AS hub_r,
                   ROUND(a2.auth, 6) AS auth_r
            FROM h2 JOIN a2 USING (node)
        """,
        "lang_mixture": """
            WITH train AS (
              SELECT lang AS label, substr(text, 1, 1000) AS head
              FROM documents WHERE doc_id % 10 < 8
            ), exploded AS (
              SELECT label, substr(head, CAST(i AS INT), 3) AS gram
              FROM (SELECT label, head,
                           unnest(generate_series(1, length(head) - 2)) AS i
                    FROM train WHERE length(head) >= 3)
            ), counts AS (
              SELECT label, gram, COUNT(*) AS c FROM exploded GROUP BY 1, 2
            ), vocab AS (
              SELECT COUNT(DISTINCT gram) AS v_all FROM counts
            ), denom_side AS (
              SELECT label, total + 0.5 * (v_all + 1) AS denom
              FROM (SELECT label, SUM(c) AS total FROM counts GROUP BY 1),
                   vocab
            ), grams AS (
              SELECT c.label, c.gram, ln((c.c + 0.5) / d.denom) AS log_prob
              FROM counts c JOIN denom_side d USING (label)
            ), labels AS (
              SELECT ld.label,
                     ln(ld.docs / nd.n_docs) AS log_prior,
                     ln(0.5 / d.denom) AS unk_log_prob
              FROM (SELECT lang AS label, COUNT(*) AS docs
                    FROM documents WHERE doc_id % 10 < 8 GROUP BY 1) ld
              CROSS JOIN (SELECT COUNT(*) AS n_docs
                          FROM documents WHERE doc_id % 10 < 8) nd
              JOIN denom_side d USING (label)
            ), ptoks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(
                       trim(COALESCE(text, '')), '\\s+'), x -> x <> '')
                       AS toks
              FROM documents WHERE doc_id % 10 >= 8
            ), segl AS (
              SELECT doc_id,
                     list_transform(
                       range(CAST(ceil(len(toks) / 12.0) AS BIGINT)),
                       i -> array_to_string(
                         toks[(i * 12 + 1):(i * 12 + 12)], ' ')) AS segs
              FROM ptoks WHERE len(toks) > 0
            ), seg AS (
              SELECT doc_id,
                     CAST(unnest(range(len(segs))) AS BIGINT) AS p_idx,
                     substr(unnest(segs), 1, 1000) AS head
              FROM segl
            ), seg_grams AS (
              SELECT doc_id, p_idx,
                     substr(head, CAST(i AS INT), 3) AS gram
              FROM (SELECT doc_id, p_idx, head,
                           unnest(generate_series(1, length(head) - 2)) AS i
                    FROM seg WHERE length(head) >= 3)
            ), per_label AS (
              SELECT sg.doc_id, sg.p_idx, l.label,
                     SUM(COALESCE(g.log_prob, l.unk_log_prob)) AS gram_ll
              FROM seg_grams sg
              CROSS JOIN labels l
              LEFT JOIN grams g ON g.gram = sg.gram AND g.label = l.label
              GROUP BY 1, 2, 3
            ), scored AS (
              SELECT s.doc_id, s.p_idx, l.label,
                     l.log_prior + COALESCE(pl.gram_ll, 0.0) AS score
              FROM seg s
              CROSS JOIN labels l
              LEFT JOIN per_label pl
                ON pl.doc_id = s.doc_id AND pl.p_idx = s.p_idx
                   AND pl.label = l.label
            ), seg_pred AS (
              SELECT doc_id, label AS pred_label
              FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY doc_id, p_idx
                      ORDER BY score DESC, label DESC) AS rn
                    FROM scored)
              WHERE rn = 1
            ), mix_counts AS (
              SELECT doc_id, pred_label AS label, COUNT(*) AS cnt
              FROM seg_pred GROUP BY 1, 2
            ), roll AS (
              SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_segments,
                     CAST(COUNT(*) AS INT) AS n_langs,
                     MAX(struct_pack(cnt := cnt, label := label)) AS m
              FROM mix_counts GROUP BY 1
            )
            SELECT doc_id, n_segments, n_langs, m.label AS majority_lang,
                   ROUND(CAST(m.cnt AS DOUBLE) / n_segments, 6)
                     AS majority_frac_r
            FROM roll
        """,
        "leakage_safe_splits": """
            WITH reps AS (
              SELECT COALESCE(text, '') AS t, MIN(doc_id) AS cluster_id
              FROM documents GROUP BY 1
            ), j AS (
              SELECT d.doc_id, r.cluster_id
              FROM documents d JOIN reps r ON COALESCE(d.text, '') = r.t
            ), b AS (
              SELECT doc_id, cluster_id,
                     CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)),
                                          1, 8))::UBIGINT % 100 AS INT)
                       AS bucket
              FROM j
            )
            SELECT doc_id, cluster_id, bucket,
                   CASE WHEN bucket < 5 THEN 'test'
                        WHEN bucket < 10 THEN 'val'
                        ELSE 'train' END AS split
            FROM b
        """,
        "bm25_maxp_search": """
            WITH tdocs AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text, '')),
                                        '([a-z0-9]+)', 1) AS terms
              FROM documents
            ), pos AS (
              SELECT doc_id, unnest(terms) AS term,
                     CAST(unnest(range(len(terms))) AS BIGINT) // 16
                       AS p_idx
              FROM tdocs
            ), post AS (
              SELECT doc_id, p_idx, term, COUNT(*) AS tf
              FROM pos GROUP BY 1, 2, 3
            ), dl AS (
              SELECT doc_id, p_idx, SUM(tf) AS dl FROM post GROUP BY 1, 2
            ), consts AS (
              SELECT COUNT(*) AS n_pass, COALESCE(SUM(dl), 0) AS tot
              FROM dl
            ), dft AS (
              SELECT term, COUNT(*) AS df FROM post
              WHERE term IN ('merge', 'spark', 'window') GROUP BY 1
            ), per AS (
              SELECT p.doc_id, p.p_idx,
                     ROUND(ln(1 + (c.n_pass - d.df + 0.5) / (d.df + 0.5))
                           * (p.tf * 2.2)
                           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl
                                / (CAST(c.tot AS DOUBLE) / c.n_pass))),
                           6) AS bm25_r
              FROM post p JOIN dft d USING (term)
                   JOIN dl l USING (doc_id, p_idx), consts c
            ), ps AS (
              SELECT doc_id, p_idx, ROUND(SUM(bm25_r), 6) AS p_score_r
              FROM per GROUP BY 1, 2
            ), best AS (
              SELECT doc_id,
                     MAX(struct_pack(s := p_score_r, np := -p_idx)) AS m
              FROM ps GROUP BY 1
            ), ds AS (
              SELECT doc_id, m.s AS score_r, CAST(-m.np AS BIGINT) AS best_p
              FROM best
            ), r AS (
              SELECT doc_id, score_r, best_p,
                     CAST(ROW_NUMBER() OVER (
                       ORDER BY score_r DESC, doc_id ASC) AS INT) AS rank
              FROM ds
            )
            SELECT doc_id, score_r, best_p, rank FROM r WHERE rank <= 10
        """,
        "weighted_sample_per_source": """
            WITH keyed AS (
              SELECT doc_id, source,
                     round(
                       ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 8))::UBIGINT + 0.5)
                          / 4294967296.0)
                       / (length(COALESCE(text, '')) + 1), 9)
                       AS sample_key_r
              FROM documents
            ), ranked AS (
              SELECT doc_id, source, sample_key_r,
                     CAST(ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY sample_key_r DESC, doc_id ASC) AS INT)
                       AS sample_rank
              FROM keyed
            )
            SELECT doc_id, source, sample_key_r, sample_rank
            FROM ranked WHERE sample_rank <= 20
        """,
        "elias_fano_stats": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id FROM tok GROUP BY 1, 2
            ), lists AS (
              SELECT term, COUNT(*) AS df, MAX(doc_id) AS max_id
              FROM post GROUP BY 1
            ), lo AS (
              SELECT term, df, max_id,
                     GREATEST(0, length(bin((max_id + 1) // df)) - 1) AS l
              FROM lists
            ), e AS (
              SELECT term, df,
                     df * l + df + ((max_id + 1) >> l) AS ef_bits
              FROM lo
            )
            SELECT term, df, df * 8 AS raw_bytes,
                   CAST(ef_bits AS BIGINT) AS ef_bits,
                   CAST((ef_bits + 7) // 8 AS BIGINT) AS ef_bytes,
                   round(CAST((ef_bits + 7) // 8 AS DOUBLE) / (df * 8.0), 6)
                     AS ratio_r
            FROM e
        """,
        "postings_vbyte_stats": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id FROM tok GROUP BY 1, 2
            ), g AS (
              SELECT term,
                     CASE WHEN lag(doc_id) OVER w IS NULL THEN doc_id + 1
                          ELSE doc_id - lag(doc_id) OVER w END AS v
              FROM post WINDOW w AS (PARTITION BY term ORDER BY doc_id)
            ), vb AS (
              SELECT term,
                     CASE WHEN v < 128 THEN 1 WHEN v < 16384 THEN 2
                          WHEN v < 2097152 THEN 3 WHEN v < 268435456 THEN 4
                          WHEN v < 34359738368 THEN 5
                          WHEN v < 4398046511104 THEN 6
                          WHEN v < 562949953421312 THEN 7
                          WHEN v < 72057594037927936 THEN 8
                          ELSE 9 END AS c
              FROM g)
            SELECT term, count(*) AS df, count(*) * 8 AS raw_bytes,
                   CAST(sum(c) AS BIGINT) AS vbyte_bytes,
                   round(CAST(sum(c) AS DOUBLE) / (count(*) * 8.0), 6)
                     AS ratio_r
            FROM vb GROUP BY term
        """,
        "bm25_search_collapsed": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ), dft AS (
              SELECT term, COUNT(*) AS df FROM post GROUP BY 1
            ), dl AS (
              SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1
            ), consts AS (
              SELECT (SELECT COUNT(*) FROM documents) AS n,
                     (SELECT COALESCE(SUM(tf), 0) FROM post) AS tot
            ), scored AS (
              SELECT p.doc_id,
                     ROUND(ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5))
                           * (p.tf * 2.2)
                           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl
                                            / (CAST(c.tot AS DOUBLE) / c.n))),
                           6) AS bm25_r
              FROM post p JOIN dft d USING (term) JOIN dl l USING (doc_id),
                   consts c
              WHERE p.term IN ('merge', 'spark', 'window')
            ), summed AS (
              SELECT doc_id, ROUND(SUM(bm25_r), 6) AS score_r
              FROM scored GROUP BY doc_id
            ), hosted AS (
              SELECT s.doc_id, d.source AS host, s.score_r,
                     CAST(ROW_NUMBER() OVER (PARTITION BY d.source
                       ORDER BY s.score_r DESC, s.doc_id ASC) AS INT)
                       AS host_rank
              FROM summed s JOIN documents d USING (doc_id)
            )
            SELECT doc_id, host, score_r, host_rank, rank FROM (
              SELECT doc_id, host, score_r, host_rank,
                     CAST(ROW_NUMBER() OVER (ORDER BY score_r DESC,
                                             doc_id ASC) AS INT) AS rank
              FROM hosted WHERE host_rank <= 1)
            WHERE rank <= 10
        """,
        # focused crawl: per-target max of parents' summed-BM25 relevance
        "focused_relevance": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ), dft AS (
              SELECT term, COUNT(*) AS df FROM post GROUP BY 1
            ), dl AS (
              SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1
            ), consts AS (
              SELECT (SELECT COUNT(*) FROM documents) AS n,
                     (SELECT COALESCE(SUM(tf), 0) FROM post) AS tot
            ), scored AS (
              SELECT p.doc_id,
                     ROUND(ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5))
                           * (p.tf * 2.2)
                           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl
                                            / (CAST(c.tot AS DOUBLE) / c.n))),
                           6) AS bm25_r
              FROM post p JOIN dft d USING (term) JOIN dl l USING (doc_id),
                   consts c
              WHERE p.term IN ('merge', 'spark', 'window')
            ), qs AS (
              SELECT doc_id, ROUND(SUM(bm25_r), 6) AS score_r
              FROM scored GROUP BY doc_id
            ), e AS (
              SELECT doc_id AS s, (doc_id * 11 + 5) % 150 AS d FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 17 + 2) % 150
              FROM documents WHERE doc_id % 3 = 0
            )
            SELECT e.d AS node, ROUND(MAX(qs.score_r), 6) AS rel_r
            FROM e JOIN qs ON qs.doc_id = e.s GROUP BY e.d
        """,
        # host-graph rollup + 2 weighted-rank sweeps: hosts synthesized as
        # h{id%20}.test, self-loops dropped, weight = link count
        "host_pagerank_2iter": """
            WITH ue AS (
              SELECT doc_id AS s, (doc_id * 11 + 5) % 150 AS d FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 17 + 2) % 150
              FROM documents WHERE doc_id % 3 = 0
            ), he AS (
              SELECT 'h' || CAST(s % 20 AS VARCHAR) || '.test' AS sh,
                     'h' || CAST(d % 20 AS VARCHAR) || '.test' AS dh
              FROM ue WHERE s % 20 <> d % 20
            ), hg AS (
              SELECT sh, dh, CAST(COUNT(*) AS DOUBLE) AS w
              FROM he GROUP BY 1, 2
            ), nodes AS (
              SELECT DISTINCT node FROM (
                SELECT sh AS node FROM hg UNION ALL SELECT dh FROM hg)
            ), wout AS (
              SELECT sh AS node, SUM(w) AS wout FROM hg GROUP BY 1
            ),
            r0 AS (SELECT n.node, 1.0 AS rank, wout.wout
                   FROM nodes n LEFT JOIN wout USING (node)),
            c1 AS (SELECT hg.dh AS node, SUM(r.rank * hg.w / r.wout) AS in_sum
                   FROM hg JOIN r0 r ON r.node = hg.sh GROUP BY 1),
            r1 AS (SELECT r0.node,
                          0.15 + 0.85 * COALESCE(c1.in_sum, 0) AS rank, r0.wout
                   FROM r0 LEFT JOIN c1 USING (node)),
            c2 AS (SELECT hg.dh AS node, SUM(r.rank * hg.w / r.wout) AS in_sum
                   FROM hg JOIN r1 r ON r.node = hg.sh GROUP BY 1),
            r2 AS (SELECT r1.node,
                          0.15 + 0.85 * COALESCE(c2.in_sum, 0) AS rank
                   FROM r1 LEFT JOIN c2 USING (node))
            -- +1e-12 pre-round bias, mirroring the Spark side (exact
            -- x.5e-6 boundary values in the damped-rank arithmetic)
            SELECT node, ROUND(rank + 1e-12, 6) AS rank_r FROM r2
        """,
        # DUST: same parse (authority regex, '?'-base, k=v pair extraction)
        # restated in DuckDB list lambdas; remainder groups -> evidence /
        # counterexample census per (host, param)
        "dust_param_rules": """
            WITH urls AS (
              SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR)
                       || '.test/page?id=' || CAST(doc_id % 7 AS VARCHAR)
                       || '&sess=' ||
                       CASE WHEN doc_id % 4 = 0 THEN 'fixed'
                            ELSE CAST(doc_id AS VARCHAR) END AS url,
                     doc_id % 7 AS fp
              FROM documents
            ), parts AS (
              SELECT fp,
                     lower(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
                     regexp_extract(url, '^([^?#]*)', 1) AS base,
                     list_transform(
                       regexp_extract_all(url, '[?&]([^=&#]+)=([^&#]*)', 0),
                       p -> p[2:]) AS pairs
              FROM urls
            ), ex AS (
              SELECT fp, host, base, pairs,
                     unnest(list_distinct(list_transform(pairs,
                       p -> string_split(p, '=')[1]))) AS param
              FROM parts WHERE host <> ''
            ), rem AS (
              SELECT fp, host, param,
                     base || '?' || array_to_string(list_sort(
                       list_filter(pairs,
                         p -> NOT starts_with(p, param || '='))), '&')
                       AS remainder
              FROM ex
            ), g AS (
              SELECT host, param, remainder,
                     COUNT(*) AS n_urls, COUNT(DISTINCT fp) AS n_fps
              FROM rem GROUP BY 1, 2, 3
            )
            SELECT host, param,
                   CAST(SUM(CASE WHEN n_urls >= 2 AND n_fps = 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS evidence_groups,
                   CAST(SUM(CASE WHEN n_fps >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS counter_groups,
                   (SUM(CASE WHEN n_urls >= 2 AND n_fps = 1
                             THEN 1 ELSE 0 END) >= 2
                    AND SUM(CASE WHEN n_fps >= 2 THEN 1 ELSE 0 END) = 0)
                     AS is_junk
            FROM g GROUP BY 1, 2
        """,
        # learn + apply: junk params filtered out (original order kept),
        # bare base when nothing survives, rule-less hosts untouched
        "dust_strip": """
            WITH urls AS (
              SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR)
                       || '.test/page?id=' || CAST(doc_id % 7 AS VARCHAR)
                       || '&sess=' ||
                       CASE WHEN doc_id % 4 = 0 THEN 'fixed'
                            ELSE CAST(doc_id AS VARCHAR) END AS url,
                     doc_id % 7 AS fp
              FROM documents
            ), parts AS (
              SELECT url, fp,
                     lower(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
                     regexp_extract(url, '^([^?#]*)', 1) AS base,
                     list_transform(
                       regexp_extract_all(url, '[?&]([^=&#]+)=([^&#]*)', 0),
                       p -> p[2:]) AS pairs
              FROM urls
            ), ex AS (
              SELECT fp, host, base, pairs,
                     unnest(list_distinct(list_transform(pairs,
                       p -> string_split(p, '=')[1]))) AS param
              FROM parts WHERE host <> ''
            ), rem AS (
              SELECT fp, host, param,
                     base || '?' || array_to_string(list_sort(
                       list_filter(pairs,
                         p -> NOT starts_with(p, param || '='))), '&')
                       AS remainder
              FROM ex
            ), g AS (
              SELECT host, param, remainder,
                     COUNT(*) AS n_urls, COUNT(DISTINCT fp) AS n_fps
              FROM rem GROUP BY 1, 2, 3
            ), rules AS (
              SELECT host, param FROM g GROUP BY 1, 2
              HAVING SUM(CASE WHEN n_urls >= 2 AND n_fps = 1
                              THEN 1 ELSE 0 END) >= 2
                 AND SUM(CASE WHEN n_fps >= 2 THEN 1 ELSE 0 END) = 0
            ), junk AS (
              SELECT host, list(param) AS junk_params FROM rules GROUP BY 1
            )
            SELECT p.url,
                   CASE WHEN j.junk_params IS NULL THEN p.url
                        WHEN len(list_filter(p.pairs, x ->
                               NOT list_contains(j.junk_params,
                                                 string_split(x, '=')[1]))) > 0
                        THEN p.base || '?' || array_to_string(
                               list_filter(p.pairs, x ->
                                 NOT list_contains(j.junk_params,
                                                   string_split(x, '=')[1])),
                               '&')
                        ELSE p.base END AS url_dusted
            FROM parts p LEFT JOIN junk j USING (host)
        """,
        # host-graph reciprocity: distinct pairs left-joined against their
        # own reversal, per-src census
        # (host, template, counts, first_url) derived from the four-branch
        # permalink construction; md5 recomputed identically both engines
        "path_template_census": """
            WITH u AS (
              SELECT doc_id,
                     'h' || (doc_id % 10) || '.test' AS host,
                     doc_id % 4 AS b,
                     md5(CAST(doc_id AS VARCHAR)) AS hx
              FROM documents),
            r AS (
              SELECT host,
                     CASE b WHEN 0 THEN '/product/{n}'
                            WHEN 1 THEN '/{n}/{n}/page-{n}.html'
                            WHEN 2 THEN '/cache/{h}/x'
                            ELSE '/about' END AS template,
                     CASE b WHEN 0 THEN '/product/' || doc_id
                            WHEN 1 THEN '/2020/' || (doc_id % 12 + 1)
                                 || '/page-' || doc_id || '.html'
                            WHEN 2 THEN '/cache/' || hx || '/x'
                            ELSE '/about' END AS path,
                     'https://' || host ||
                     CASE b WHEN 0 THEN '/product/' || doc_id
                            WHEN 1 THEN '/2020/' || (doc_id % 12 + 1)
                                 || '/page-' || doc_id || '.html'
                            WHEN 2 THEN '/cache/' || hx || '/x?q=' || doc_id
                            ELSE '/about' END AS url
              FROM u)
            SELECT host, template,
                   COUNT(*) AS n_urls,
                   COUNT(DISTINCT path) AS n_distinct_paths,
                   MIN(url) AS first_url
            FROM r GROUP BY host, template
            HAVING COUNT(*) >= 2
        """,
        # both rankings recomputed with list_cosine_similarity + the same
        # (cosine desc, id) tie-break; recall joined per dim
        "truncation_recall": """
            WITH corpus AS (
              SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 4),
            probes AS (
              SELECT vec_id AS probe_id, embedding AS probe_vec
              FROM embeddings WHERE vec_id < 4),
            dimt AS (SELECT unnest([8, 16, 32, 64]) AS dim),
            truth AS (
              SELECT probe_id, vec_id FROM (
                SELECT p.probe_id, c.vec_id,
                       ROW_NUMBER() OVER (
                         PARTITION BY p.probe_id
                         ORDER BY list_cosine_similarity(c.embedding,
                                                         p.probe_vec) DESC,
                                  c.vec_id) AS rk
                FROM corpus c CROSS JOIN probes p)
              WHERE rk <= 5),
            approx AS (
              SELECT d.dim, probe_id, vec_id FROM (
                SELECT d.dim, p.probe_id, c.vec_id,
                       ROW_NUMBER() OVER (
                         PARTITION BY d.dim, p.probe_id
                         ORDER BY list_cosine_similarity(
                                    c.embedding[1:d.dim],
                                    p.probe_vec[1:d.dim]) DESC,
                                  c.vec_id) AS rk
                FROM dimt d, corpus c, probes p) d
              WHERE rk <= 5)
            SELECT a.dim, 5 AS k, 4 AS n_probes,
                   ROUND(SUM(CASE WHEN t.vec_id IS NOT NULL
                                  THEN 1 ELSE 0 END) / 20.0, 6)
                     AS mean_recall_r
            FROM approx a
            LEFT JOIN truth t USING (probe_id, vec_id)
            GROUP BY a.dim
        """,
        # (pub_date, pub_source) derived per construction branch;
        # branch 3 plants all three sources and jsonld must win
        "publish_date_fusion": """
            SELECT doc_id AS id,
                   CASE doc_id % 5
                     WHEN 0 THEN '2022-03-' || (10 + doc_id % 10)
                     WHEN 1 THEN '2023-11-' || (10 + doc_id % 10)
                     WHEN 2 THEN '2020-07-' || (10 + doc_id % 10)
                     WHEN 3 THEN '2022-03-' || (10 + doc_id % 10)
                     ELSE NULL END AS pub_date,
                   CASE doc_id % 5
                     WHEN 0 THEN 'jsonld'
                     WHEN 1 THEN 'meta'
                     WHEN 2 THEN 'url'
                     WHEN 3 THEN 'jsonld'
                     ELSE NULL END AS pub_source
            FROM documents
        """,
        # expected type derived per construction branch
        "sniff_content_type": """
            SELECT doc_id,
                   CASE doc_id % 6
                     WHEN 0 THEN 'application/pdf'
                     WHEN 1 THEN 'image/png'
                     WHEN 2 THEN 'text/html'
                     WHEN 3 THEN 'image/gif'
                     ELSE NULL END AS sniffed_type,
                   doc_id % 6 IN (0, 1, 2, 3) AS type_sniffable
            FROM documents
        """,
        # novelty counted by target parity (seen = the even targets)
        "outlink_novelty": """
            WITH links AS (
              SELECT DISTINCT 'p' || doc_id AS src,
                     (doc_id * 3 + j) % 900 AS v
              FROM (SELECT doc_id,
                           unnest(generate_series(0, CAST(doc_id % 4 AS INT)))
                             AS j
                    FROM documents WHERE doc_id % 7 <> 0)
            ), agg AS (
              SELECT src, COUNT(*) AS n_links,
                     SUM(CASE WHEN v % 2 = 1 THEN 1 ELSE 0 END) AS n_novel
              FROM links GROUP BY src
            )
            SELECT s.src,
                   COALESCE(a.n_links, 0) AS n_links,
                   COALESCE(a.n_novel, 0) AS n_novel,
                   ROUND(CASE WHEN COALESCE(a.n_links, 0) > 0
                              THEN COALESCE(a.n_novel, 0)
                                   / CAST(a.n_links AS DOUBLE)
                              ELSE 0.0 END, 6) AS novelty_r
            FROM (SELECT 'p' || doc_id AS src FROM documents) s
            LEFT JOIN agg a USING (src)
        """,
        # per-line cue regexes replayed verbatim (RE2-safe by construction)
        "code_fraction": f"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 4 = 0
                          THEN text || chr(10) || 'return x == y;'
                               || chr(10) || 'function f() {{'
                               || chr(10) || '    indented(1);'
                               || chr(10) || '}}'
                          ELSE text END AS text
              FROM documents),
            l AS (
              SELECT doc_id,
                     list_filter(string_split(text, chr(10)),
                                 x -> trim(x) <> '') AS lines
              FROM t),
            c AS (
              SELECT doc_id, len(lines) AS n_lines,
                     len(list_filter(lines, x ->
                         regexp_matches(x, '{textqc.CODE_LINE_RES[0]}')
                      OR regexp_matches(x, '{textqc.CODE_LINE_RES[1]}')
                      OR regexp_matches(x, '{textqc.CODE_LINE_RES[2]}')
                      OR regexp_matches(x, '{textqc.CODE_LINE_RES[3]}')))
                       AS n_code
              FROM l)
            SELECT doc_id AS id, n_lines, n_code AS n_code_lines,
                   ROUND(CASE WHEN n_lines > 0
                              THEN n_code / CAST(n_lines AS DOUBLE)
                              ELSE 0.0 END, 6) AS code_frac_r,
                   (CASE WHEN n_lines > 0
                         THEN n_code / CAST(n_lines AS DOUBLE)
                         ELSE 0.0 END) >= 0.3 AND n_code >= 3 AS is_codey
            FROM c
        """,
        # expected decode pinned per planted case — the RFC 3492 decode is
        # what is under test, so the oracle states answers, never recomputes
        "idn_host_audit": """
            SELECT CASE doc_id % 6
                     WHEN 0 THEN 'h' || doc_id || '.example.com'
                     WHEN 1 THEN 'xn--mnchen-3ya.de'
                     WHEN 2 THEN 'xn--80ak6aa92e.com'
                     WHEN 3 THEN 'xn--pple-43d.com'
                     WHEN 4 THEN 'xn--fiq228c.cn'
                     ELSE 'xn--999999999.com' END AS host,
                   doc_id % 6 <> 0 AS is_idn,
                   CASE doc_id % 6
                     WHEN 0 THEN 'h' || doc_id || '.example.com'
                     WHEN 1 THEN 'm' || chr(252) || 'nchen.de'
                     WHEN 2 THEN chr(1072) || chr(1088) || chr(1088)
                                 || chr(1231) || chr(1077) || '.com'
                     WHEN 3 THEN chr(1072) || 'pple.com'
                     WHEN 4 THEN chr(20013) || chr(25991) || '.cn'
                     ELSE NULL END AS unicode_host,
                   CASE doc_id % 6
                     WHEN 0 THEN 'latin'
                     WHEN 1 THEN 'latin'
                     WHEN 2 THEN 'cyrillic|latin'
                     WHEN 3 THEN 'cyrillic|latin'
                     WHEN 4 THEN 'latin|other'
                     ELSE NULL END AS scripts,
                   doc_id % 6 = 3 AS mixed_script,
                   doc_id % 6 = 5 AS decode_error
            FROM documents
        """,
        # html_chars from the reconstructed string; text/link chars
        # arithmetic (collapsed text + n anchors of 'LINK'+digits)
        "markup_density": """
            WITH b AS (
              SELECT doc_id, text, doc_id % 3 AS n,
                     CAST(doc_id AS VARCHAR) AS ds,
                     strlen(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS tc0
              FROM documents),
            h AS (
              SELECT *,
                '<html><head><title>T</title><style>p{color:red}</style></head><body><p>'
                  || text || '</p>'
                  || repeat('<a href="x">LINK' || ds || '</a>', n)
                  || '</body></html>' AS html
              FROM b)
            SELECT doc_id AS id,
                   strlen(html) AS html_chars,
                   12 + 2 * n AS tag_count,
                   tc0 + n * (5 + strlen(ds)) AS text_chars,
                   n * (4 + strlen(ds)) AS link_chars,
                   ROUND((tc0 + n * (5 + strlen(ds)))
                         / CAST(strlen(html) AS DOUBLE), 6) AS text_ratio_r,
                   ROUND(n * (4 + strlen(ds))
                         / CAST(tc0 + n * (5 + strlen(ds)) AS DOUBLE), 6)
                     AS link_density_r
            FROM h
        """,
        # (year, month, day, kind) derived from the permalink construction
        "url_path_dates": """
            SELECT doc_id,
                   CASE WHEN doc_id % 5 IN (0, 1, 2)
                        THEN 2000 + doc_id % 20 END AS url_year,
                   CASE WHEN doc_id % 5 IN (0, 1, 2)
                        THEN doc_id % 12 + 1 END AS url_month,
                   CASE WHEN doc_id % 5 IN (0, 1)
                        THEN doc_id % 28 + 1 END AS url_day,
                   CASE WHEN doc_id % 5 IN (0, 1) THEN 'ymd'
                        WHEN doc_id % 5 = 2 THEN 'ym' END AS url_date_kind
            FROM documents
        """,
        # tag sequences are static per template, so the fingerprints are
        # md5 of known literals and the census is pure arithmetic
        "template_shapes": """
            SELECT md5('html>head>title>title>head>body>div>p>p>div>body>html')
                     AS shape_fp,
                   COUNT(*) AS n_pages,
                   COUNT(DISTINCT doc_id % 20) AS n_hosts,
                   12 AS n_tags,
                   MIN(doc_id) AS first_id
            FROM documents WHERE doc_id % 3 <> 0
            UNION ALL
            SELECT md5('html>head>title>title>head>body>div>p>p>div>span>span>body>html'),
                   COUNT(*), COUNT(DISTINCT doc_id % 20), 14, MIN(doc_id)
            FROM documents WHERE doc_id % 3 = 0
        """,
        # fingerprint census recomputed over the same planted-farm +
        # background construction
        "outlink_farms": """
            WITH base AS (
              SELECT doc_id AS src, (doc_id * 11 + 5) % 150 AS dst
              FROM documents WHERE doc_id % 10 NOT IN (1, 3, 7)
              UNION ALL
              SELECT doc_id, (doc_id * 17 + 2) % 150
              FROM documents
              WHERE doc_id % 3 = 0 AND doc_id % 10 NOT IN (1, 3, 7)
              UNION ALL
              SELECT doc_id, f
              FROM documents, (VALUES (9001), (9002), (9003)) AS v(f)
              WHERE doc_id % 10 IN (1, 3, 7)
            ), per_src AS (
              SELECT src, 'h' || (src % 20) AS host,
                     md5(array_to_string(
                       list_sort(list(DISTINCT CAST(dst AS VARCHAR))),
                       '|')) AS farm_fp,
                     COUNT(DISTINCT dst) AS deg
              FROM base GROUP BY src
            )
            SELECT farm_fp,
                   COUNT(*) AS n_pages,
                   COUNT(DISTINCT host) AS n_hosts,
                   MIN(deg) AS n_outlinks,
                   MIN(src) AS first_src,
                   COUNT(DISTINCT host) >= 2 AS cross_host
            FROM per_src GROUP BY farm_fp
            HAVING COUNT(*) >= 3
        """,
        "reciprocal_links": """
            WITH ue AS (
              SELECT doc_id AS s, (doc_id * 11 + 5) % 150 AS d FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 17 + 2) % 150
              FROM documents WHERE doc_id % 3 = 0
            ), he AS (
              SELECT 'h' || CAST(s % 20 AS VARCHAR) || '.test' AS sh,
                     'h' || CAST(d % 20 AS VARCHAR) || '.test' AS dh
              FROM ue WHERE s % 20 <> d % 20
            ), hg AS (
              SELECT DISTINCT sh, dh FROM he
            ), rev AS (
              SELECT dh AS sh, sh AS dh, 1 AS r FROM hg
            )
            SELECT hg.sh AS host,
                   CAST(COUNT(*) AS BIGINT) AS n_out,
                   CAST(SUM(COALESCE(rev.r, 0)) AS BIGINT) AS n_recip,
                   ROUND(CAST(SUM(COALESCE(rev.r, 0)) AS DOUBLE) / COUNT(*), 6)
                     AS recip_ratio
            FROM hg LEFT JOIN rev USING (sh, dh) GROUP BY 1
        """,
        # the incremental merge's oracle IS the full rebuild over the
        # substituted corpus: refreshed texts swapped in, deletions (which
        # beat refreshes on the overlap) removed
        "postings_delta_merge": """
            WITH final AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 = 0
                          THEN COALESCE(text, '') || ' refreshed refreshed'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 25 <> 0
            ), tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                               '([a-z0-9]+)', 1)) AS term
              FROM final
            )
            SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        """,
        # asymmetric containment over pairs with planted swallowing — same
        # gram pipeline as ngram_jaccard_pairs, normalized per side
        "ngram_containment_pairs": """
            WITH p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.text AS ta, a.text || ' ' || b.text AS tb
              FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
              WHERE a.doc_id % 10 = 0
            ), g AS (
              SELECT id_a, id_b,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(sa) - 2, 1)),
                       i -> array_to_string(sa[i:i+2], ' '))) AS ga,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(sb) - 2, 1)),
                       i -> array_to_string(sb[i:i+2], ' '))) AS gb
              FROM (SELECT id_a, id_b,
                           string_split_regex(lower(trim(ta)), '\\s+') AS sa,
                           string_split_regex(lower(trim(tb)), '\\s+') AS sb
                    FROM p)
            )
            SELECT id_a, id_b,
                   ROUND(CASE WHEN len(ga) > 0
                              THEN CAST(len(list_intersect(ga, gb)) AS DOUBLE)
                                   / len(ga) ELSE 0 END, 4) AS cont_ab_r,
                   ROUND(CASE WHEN len(gb) > 0
                              THEN CAST(len(list_intersect(ga, gb)) AS DOUBLE)
                                   / len(gb) ELSE 0 END, 4) AS cont_ba_r
            FROM g
        """,
        # alias contraction: endpoints rewritten to representatives
        # (unmapped keep themselves), self-loops dropped, weights summed
        "contracted_link_graph": """
            WITH e AS (
              SELECT doc_id AS s, (doc_id * 11 + 5) % 150 AS d FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 17 + 2) % 150
              FROM documents WHERE doc_id % 3 = 0
            ), m AS (
              SELECT doc_id AS n, doc_id - doc_id % 4 AS r
              FROM documents WHERE doc_id % 2 = 0
            ), c AS (
              SELECT COALESCE(ms.r, e.s) AS src, COALESCE(md.r, e.d) AS dst
              FROM e LEFT JOIN m ms ON ms.n = e.s LEFT JOIN m md ON md.n = e.d
            )
            SELECT src, dst, COUNT(*) AS weight
            FROM c WHERE src <> dst GROUP BY 1, 2
        """,
        # spherical k-means unrolled: init = 8 lowest-id vectors quantized
        # to 6dp; per sweep cosine-argmax assignment (IF(norm>0) guard,
        # ties smallest cid — the exact literal-path formula) then per-dim
        # mean rounded to 6; an empty cluster keeps its previous centroid
        "kmeans_codebook": """
            WITH c0 AS (
              SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
                     list_transform(embedding,
                                    x -> ROUND(CAST(x AS DOUBLE), 6)) AS cv
              FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
            ), s1 AS (
              SELECT e.vec_id, e.embedding, c.cid,
                     list_dot_product(
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                       c.cv) AS dot,
                     sqrt(list_dot_product(
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE))))
                       AS nv,
                     sqrt(list_dot_product(c.cv, c.cv)) AS nc
              FROM embeddings e CROSS JOIN c0 c
            ), a1 AS (
              SELECT vec_id, embedding, cid FROM (
                SELECT vec_id, embedding, cid,
                       ROW_NUMBER() OVER (
                         PARTITION BY vec_id
                         ORDER BY CASE WHEN nv > 0 AND nc > 0
                                       THEN dot / (nv * nc) ELSE 0 END DESC,
                                  cid ASC) AS rn
                FROM s1) WHERE rn = 1
            ), u1 AS (
              SELECT cid, u.i - 1 AS dim,
                     ROUND(AVG(CAST(embedding[u.i] AS DOUBLE)), 6) AS val
              FROM a1, UNNEST(range(1, len(embedding) + 1)) AS u(i)
              GROUP BY 1, 2
            ), c1 AS (
              SELECT c0.cid, COALESCE(m.cv, c0.cv) AS cv
              FROM c0 LEFT JOIN (
                SELECT cid, list(val ORDER BY dim) AS cv FROM u1 GROUP BY cid
              ) m USING (cid)
            ), s2 AS (
              SELECT e.vec_id, e.embedding, c.cid,
                     list_dot_product(
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                       c.cv) AS dot,
                     sqrt(list_dot_product(
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE))))
                       AS nv,
                     sqrt(list_dot_product(c.cv, c.cv)) AS nc
              FROM embeddings e CROSS JOIN c1 c
            ), a2 AS (
              SELECT vec_id, embedding, cid FROM (
                SELECT vec_id, embedding, cid,
                       ROW_NUMBER() OVER (
                         PARTITION BY vec_id
                         ORDER BY CASE WHEN nv > 0 AND nc > 0
                                       THEN dot / (nv * nc) ELSE 0 END DESC,
                                  cid ASC) AS rn
                FROM s2) WHERE rn = 1
            ), u2 AS (
              SELECT cid, u.i - 1 AS dim,
                     ROUND(AVG(CAST(embedding[u.i] AS DOUBLE)), 6) AS val
              FROM a2, UNNEST(range(1, len(embedding) + 1)) AS u(i)
              GROUP BY 1, 2
            ), c2 AS (
              SELECT c1.cid, COALESCE(m.cv, c1.cv) AS cv
              FROM c1 LEFT JOIN (
                SELECT cid, list(val ORDER BY dim) AS cv FROM u2 GROUP BY cid
              ) m USING (cid)
            )
            SELECT cid AS cent_id, u.i - 1 AS dim, cv[u.i] AS value_r
            FROM c2, UNNEST(range(1, len(cv) + 1)) AS u(i)
        """,
        # log2 in-degree buckets over the shared link graph
        "degree_histogram_in": """
            WITH e AS (
              SELECT doc_id AS s, (doc_id * 11 + 5) % 150 AS d FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 17 + 2) % 150
              FROM documents WHERE doc_id % 3 = 0
            ), deg AS (
              SELECT d AS node, COUNT(*) AS deg FROM e GROUP BY d
            )
            SELECT CAST(FLOOR(log2(deg)) AS INTEGER) AS bucket,
                   COUNT(*) AS n_nodes,
                   MIN(deg) AS min_deg, MAX(deg) AS max_deg
            FROM deg GROUP BY 1
        """,
    }


def _lang_id_oracle() -> str:
    """argmax(lang by stopword hits), ties broken by greatest lang code —
    matches textqc.col_lang_id's array_max((hits, lang)) semantics."""
    hit_cols = ",\n".join(
        f"len(list_filter(toks, x -> list_contains({_sql_list(words)}, lower(x)))) AS h_{lang}"
        for lang, words in textqc.STOPWORDS.items()
    )
    return f"""
        SELECT doc_id,
               CASE WHEN m = 0 THEN 'und'
                    WHEN h_zh = m THEN 'zh'
                    WHEN h_fr = m THEN 'fr'
                    WHEN h_es = m THEN 'es'
                    WHEN h_en = m THEN 'en'
                    ELSE 'de' END AS lang_pred
        FROM (
          SELECT doc_id, h_en, h_de, h_es, h_fr, h_zh,
                 greatest(h_en, h_de, h_es, h_fr, h_zh) AS m
          FROM (
            SELECT doc_id, {hit_cols}
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
                  FROM documents)))
    """
