"""Training-corpus curation operators: benchmark decontamination,
deterministic train/val/test splits, stratified hash sampling, and
per-source quota selection.

These are the selection/partitioning stages a large-scale training-data
pipeline runs after QC (textqc.py) and dedup (dedup.py):

- **Decontamination** — drop/flag training documents that share word
  n-grams with an evaluation benchmark (the GPT-3 appendix-C /
  Gopher-style 13-gram overlap check). The benchmark side is tiny
  relative to the corpus, so the join broadcasts; the corpus side never
  shuffles its text — only (id, gram) rows for *matching* grams reach
  the aggregation.
- **Split assignment** — deterministic, seed-free train/val/test
  assignment from a content-stable hash of the document id, so the
  split survives recomputation, backfills, and engine changes (md5 is
  portable across Spark/DuckDB/Python — no xxhash64 dependency).
- **Stratified sampling** — per-stratum deterministic subsample by the
  same hash-bucket trick (e.g. "20% of every language").
- **Per-source quota** — cap each source's contribution, keeping the
  top-k by a quality ordering; two-phase (salted partial top-k, then
  exact top-k over survivors) so one mega-source cannot serialize a
  task — the same skew discipline as the frontier's politeness window
  (frontier.politeness_tag).

Reference: the reference library has no corpus-curation stage (it is a
fetch/extract library); these operators extend the engine for the
training-data pipeline the crawl feeds, per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "word_ngrams",
    "benchmark_ngrams",
    "decontaminate",
    "col_hash_bucket",
    "assign_splits",
    "leakage_safe_splits",
    "exact_dup_cluster_ids",
    "stratified_hash_sample",
    "per_source_quota",
    "temperature_mixture_rates",
    "col_hash_uniform",
    "weighted_sample",
    "PII_PATTERNS",
    "url_filters",
    "pii_signals",
    "redact_pii",
]

# Above this many benchmark-gram rows we stop broadcasting and let the
# planner shuffle — mirrors frontier.redirect_broadcast_rows' size gate.
# ENFORCED in decontaminate via a limit-bounded count (scan stops early, so
# deciding costs O(gate), not O(table)). 2M grams ≈ 100 MB serialized —
# about the most a modest real-cluster executor should be handed.
BENCH_BROADCAST_ROWS = 2_000_000


def word_ngrams(text_col: str | Column, n: int) -> Column:
    """Distinct lowercase word ``n``-grams of a text column as an array —
    pure Catalyst (split → sequence → transform → array_distinct), no
    Python in the hot path. Distinct-per-doc BEFORE any explode/join is
    the scale lever: a 10^5-token page emits each boilerplate gram once."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != F.lit(""))
    # guard: Spark sequence(1, 0) DESCENDS ([1, 0]); short texts must yield []
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
        ),
    ).otherwise(F.array().cast("array<string>"))


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct word n-grams of an evaluation benchmark: one `gram` column,
    globally deduplicated. This is the small side of the contamination
    join."""
    return (
        benchmark.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark_grams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast: bool | None = None,
) -> DataFrame:
    """Benchmark-overlap contamination check: documents sharing ≥1 word
    ``n``-gram with the benchmark, with the matched-gram count per doc.

    Output: (id_col, n_matched_grams), one row per contaminated document.
    Compose with a left_anti join to drop them, or keep the ledger for
    threshold tuning (e.g. Gopher drops on ≥80% 13-gram overlap).

    Scale shape (100 TB corpus, ~10^6-gram benchmark):
    - corpus side: scan → per-doc distinct grams → explode. Map-only.
    - join: broadcast hash join on `gram`. With ``broadcast=None`` (the
      default) the benchmark side is COUNTED once with a limit-bounded
      probe (the scan stops at the gate, so deciding costs O(gate) rows)
      and broadcast only under BENCH_BROADCAST_ROWS — the measured-gate
      discipline of frontier.resolve_redirects / Crawler.__init__. Pass
      True/False to pin the strategy and skip the probe.
    - only MATCHING (id, gram) rows survive to the groupBy — the shuffle
      is proportional to contamination, not corpus size.
    """
    if broadcast is None:
        # probe the raw (pre-distinct) row count: an upper bound on the
        # distinct gram count, and countable without the distinct's shuffle
        probe = benchmark_grams.limit(BENCH_BROADCAST_ROWS + 1).count()
        broadcast = probe <= BENCH_BROADCAST_ROWS
    grams = benchmark_grams.select("gram").distinct()
    small = F.broadcast(grams) if broadcast else grams
    doc_grams = docs.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
    )
    return (
        doc_grams.join(small, "gram")
        .groupBy(id_col)
        .agg(F.count("gram").alias("n_matched_grams"))
    )


def fuzzy_decontaminate(
    docs: DataFrame | None = None,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket_size: int | None = 2000,
    docs_sigs: DataFrame | None = None,
    benchmark_sigs: DataFrame | None = None,
) -> DataFrame:
    """NEAR-duplicate benchmark contamination — the fuzzy complement of
    `decontaminate`'s exact n-gram overlap (the GPT-3 appendix-C lesson:
    benchmark text reaches the crawl paraphrased, truncated, or
    re-punctuated, and an exact 8-gram join misses every variant; the
    MinHash screen catches anything above `jaccard_threshold` shingle
    similarity).

    Output: (id_col, benchmark_id, est_jaccard) — one row per
    contaminated (corpus doc, benchmark doc) pair. Compose with a
    left_anti on id_col to drop, or keep the ledger for threshold
    tuning, exactly like `decontaminate`.

    Built ON the incremental near-dup probe (`dedup.minhash_probe_pairs`
    with corpus as the standing side and the benchmark as the new side),
    so the scale story is inherited: corpus banding is a map-only
    projection of the (optionally standing, tick-appended) signature
    table; the benchmark side is tiny; the band join shuffles ∝
    benchmark + matched buckets, NEVER corpus²; the hot-bucket census is
    combined across sides. Ids ride through the probe as a
    ``struct(keyspace, id-as-string)`` tag — keyspace 0 for corpus, 1 for
    benchmark — so the two keyspaces cannot collide whatever the id TYPE
    (long, string, url, mixed across sides) and benchmark-internal pairs
    are identifiable (dropped — benchmark×benchmark similarity is not
    contamination). Each output column casts back to its own side's
    original id type, so string/url-keyed corpora round-trip unchanged.

    ``docs_sigs``/``benchmark_sigs`` inject precomputed (id, sig) tables
    (the standing-table deployment, and the engine-portable md5
    signatures the SQL oracle replays); otherwise signatures come from
    `dedup.minhash_signatures` (crc32 production path)."""
    from .dedup import minhash_probe_pairs, minhash_signatures

    if docs_sigs is None:
        docs_sigs = minhash_signatures(
            docs, text_col, id_col, num_perm, shingle_n, seed
        )
    if benchmark_sigs is None:
        benchmark_sigs = minhash_signatures(
            benchmark, text_col, id_col, num_perm, shingle_n, seed
        )
    def tag(sigs: DataFrame, keyspace: int) -> DataFrame:
        # struct ordering (ks first) keeps least/greatest + id_a < id_b
        # well-defined inside the probe for ANY castable id type
        return sigs.select(
            F.struct(
                F.lit(keyspace).alias("ks"), F.col("id").cast("string").alias("k")
            ).alias("id"),
            "sig",
        )

    pairs = minhash_probe_pairs(
        tag(docs_sigs, 0), tag(benchmark_sigs, 1),
        num_perm, bands, jaccard_threshold, max_bucket_size,
    )
    cross = pairs.filter(F.col("id_a.ks") != F.col("id_b.ks"))
    corpus_side = F.when(F.col("id_a.ks") == 0, F.col("id_a.k")).otherwise(
        F.col("id_b.k")
    )
    bench_side = F.when(F.col("id_a.ks") == 1, F.col("id_a.k")).otherwise(
        F.col("id_b.k")
    )
    return cross.select(
        corpus_side.cast(docs_sigs.schema["id"].dataType).alias(id_col),
        bench_side.cast(benchmark_sigs.schema["id"].dataType).alias("benchmark_id"),
        "est_jaccard",
    )


def col_hash_bucket(id_col: str | Column, n_buckets: int = 100) -> Column:
    """Deterministic, engine-portable hash bucket in [0, n_buckets):
    first 8 hex chars of md5(id as string) → int → mod. md5 (not
    xxhash64) so DuckDB/Python reproduce the same assignment bit-for-bit
    — a split must never depend on one engine's private hash."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % F.lit(n_buckets)).cast("int")


def assign_splits(
    docs: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = md5-hash of the
    id mod 100; test = [0, test_pct), val = [test_pct, test_pct+val_pct),
    train = rest. Pure projection — no shuffle, no RNG, stable across
    recomputation and cluster size (the property a training pipeline
    actually needs from its split)."""
    b = col_hash_bucket(id_col, 100)
    split = (
        F.when(b < test_pct, F.lit("test"))
        .when(b < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return docs.withColumn("bucket", b).withColumn("split", split)


def leakage_safe_splits(
    docs: DataFrame,
    cluster_col: str,
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """`assign_splits`, but hashed on a CLUSTER id instead of the doc id,
    so every member of a duplicate cluster lands in the SAME split. The
    leak `assign_splits` cannot prevent: near/exact duplicates that
    survive dedup (or are deliberately kept) get independent per-doc
    buckets, so a doc and its twin can straddle train and test — the
    C4-style train/test contamination Dodge et al. (EMNLP 2021)
    documented. Hashing the cluster id makes the split decision a pure
    function of WHICH cluster, never which copy.

    ``cluster_col`` is any stable cluster id — `graph.connected_components`
    output, an exact content fingerprint group, or a MinHash-LSH cluster
    representative. Pure projection (the md5 bucket of cluster_col), no
    shuffle beyond whatever produced the clusters."""
    b = col_hash_bucket(cluster_col, 100)
    split = (
        F.when(b < test_pct, F.lit("test"))
        .when(b < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return docs.withColumn("bucket", b).withColumn("split", split)


def exact_dup_cluster_ids(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Input columns + ``cluster_id`` = the MIN doc id among documents
    with byte-identical text (md5-keyed, engine-portable — never
    xxhash64, a split must survive engine changes). Singletons are their
    own cluster. The cheap feeder for `leakage_safe_splits` when no
    near-dup clustering has run: two partial-agg shapes — a (fingerprint
    → min id) census joined back on the fingerprint, shuffle bounded by
    distinct fingerprints + one row per doc, text never rides either
    exchange (only its md5 does)."""
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("")).cast("binary"))
    keyed = docs.withColumn("_fp", fp)
    reps = keyed.groupBy("_fp").agg(
        F.min(F.col(id_col)).alias("cluster_id")
    )
    return keyed.join(reps, "_fp").drop("_fp")


def stratified_hash_sample(
    docs: DataFrame,
    strata_col: str,
    rate_pct: int | dict[str, int],
    id_col: str = "doc_id",
    n_buckets: int = 100,
) -> DataFrame:
    """Deterministic per-stratum subsample: keep rows whose hash bucket
    falls below the stratum's rate. ``rate_pct`` is either one int for
    every stratum or a {stratum: pct} dict (missing strata → 0, i.e.
    dropped). Pure filter — map-only at any scale, and the same rows are
    kept on every rerun (reservoir/df.sample would not be)."""
    b = col_hash_bucket(id_col, n_buckets)
    if isinstance(rate_pct, dict):
        mapping = F.create_map(
            *[F.lit(x) for kv in rate_pct.items() for x in kv]
        )
        thresh = F.coalesce(mapping[F.col(strata_col)], F.lit(0))
    else:
        thresh = F.lit(int(rate_pct))
    return docs.filter(b < thresh)


def per_source_quota(
    docs: DataFrame,
    k: int,
    source_col: str = "source",
    order_by: list[Column] | None = None,
    id_col: str = "doc_id",
    salt: int = 32,
) -> DataFrame:
    """Cap each source's contribution at ``k`` documents, keeping the best
    by ``order_by`` (default: longest first, id tiebreak — callers pass a
    quality score). Adds a ``quota_rank`` column (1-based).

    Two-phase top-k so a mega-source (one domain contributing 10^9 docs
    at 100 TB) never serializes one window task:
    phase 1 ranks within (source, salt) partitions and keeps ≤k per salt
    bucket (map-side-bounded); phase 2 ranks the ≤k·salt survivors
    exactly. Same discipline as frontier.politeness_tag's host window."""
    if order_by is None:
        order_by = [F.length("text").desc(), F.col(id_col).asc()]
    salted = docs.withColumn(
        "_qsalt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt))
    )
    w1 = Window.partitionBy(source_col, "_qsalt").orderBy(*order_by)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_qsalt")
    )
    w2 = Window.partitionBy(source_col).orderBy(*order_by)
    return (
        survivors.withColumn("quota_rank", F.row_number().over(w2))
        .filter(F.col("quota_rank") <= k)
    )


def col_hash_uniform(id_col: str | Column) -> Column:
    """Deterministic, engine-portable uniform in (0, 1): first 8 hex
    chars of md5(id as string) → 32-bit int h, then (h + 0.5) / 2^32.
    The +0.5 keeps 0 and 1 strictly out (ln(u) must stay finite) and
    every value is an exact double (32 + 1 mantissa bits ≪ 53), so
    Spark, DuckDB, and Python reproduce it bit-for-bit — the same
    discipline as `col_hash_bucket`, extended from buckets to reals."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "double"
    )
    return (h + F.lit(0.5)) / F.lit(4294967296.0)


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str = "weight",
    strata_col: str | None = None,
    id_col: str = "doc_id",
    salt: int = 32,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per stratum, inclusion
    probability proportional to ``weight_col`` (Efraimidis & Spirakis
    2006, algorithm A-ES): each row gets key = u^(1/w) with u uniform in
    (0,1); the k largest keys ARE a w-weighted sample. Computed in log
    space — key_ln = ln(u)/w — which is order-isomorphic and never
    underflows (u^(1/w) for a tiny u and w < 1 denormalizes; ln(u)/w is
    a tame double).

    Unlike `per_source_quota` (deterministic top-k BY the score — the
    best docs, full stop) this draws a lottery BIASED by the score: a
    10× weight means 10× the odds, not certain inclusion — the shape a
    training mixture wants when diversity matters as much as quality
    ("sample 1M docs/source, favoring quality, without collapsing onto
    the head"). u comes from `col_hash_uniform`, so the "randomness" is
    a pure function of the id: the same rows win on every rerun, every
    engine, every cluster size — seed-free reproducibility, same as
    `assign_splits`.

    Rows with null/non-positive weight are dropped (they cannot be
    sampled). Ranking uses key_ln ROUNDED to 9 decimals (then id ASC):
    Spark's Math.log and DuckDB's libm ln may differ in the last ulp,
    and ranking raw doubles would let that flip an ordering — the
    tfidf_top_terms discipline. Returns the input columns plus
    (sample_key_r, sample_rank).

    Physical shape: pure projection + the two-phase salted top-k window
    from `per_source_quota` — phase 1 bounds every window task at k per
    (stratum, salt) bucket, so a mega-stratum (one source with 10^9
    docs at 100 TB) never serializes one task; phase 2 ranks the
    ≤ k·salt survivors exactly. No joins, one shuffle per phase.
    strata_col=None draws one global sample (phase 2 degenerates to a
    single ≤ k·salt-row task — bounded by construction).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    key_ln = F.round(
        F.log(col_hash_uniform(id_col)) / F.col(weight_col), 9
    )
    keyed = docs.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("sample_key_r", key_ln)
    strata = [strata_col] if strata_col is not None else []
    order = [F.col("sample_key_r").desc(), F.col(id_col).asc()]
    salted = keyed.withColumn(
        "_wsalt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt))
    )
    w1 = Window.partitionBy(*strata, "_wsalt").orderBy(*order)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_wsalt")
    )
    w2 = (
        Window.partitionBy(*strata).orderBy(*order)
        if strata
        else Window.partitionBy(F.lit(0)).orderBy(*order)
    )
    return (
        survivors.withColumn(
            "sample_rank", F.row_number().over(w2).cast("int")
        )
        .filter(F.col("sample_rank") <= k)
    )


# --- PII masking (the Dolma/BigScience-ROOTS pre-training scrub) -----------
#
# Patterns are deliberately restricted to syntax with IDENTICAL semantics in
# Java regex (Spark executors) and RE2 (DuckDB oracle): no lookaround, no
# backreferences, ASCII classes only. Both engines use leftmost-first
# alternation, so overall match extents — the only thing count/replace
# depend on — agree. Replacement tokens are Dolma's public mask strings.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+",
        "|||EMAIL_ADDRESS|||",
    ),
    # strict dotted-quad with 0-255 octets; \b is ASCII-equivalent on both
    # engines for this corpus. "1.2.3.4.5" masks its first four octets —
    # same extent on both engines (leftmost match, then boundary).
    "ip": (
        r"\b((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
        r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b",
        "|||IP_ADDRESS|||",
    ),
    # NANP-shaped 3-3-4 with uniform separators; optional parens/extensions
    # are deliberately out of scope (they need ambiguous optional groups
    # whose engine-specific backtracking order we refuse to depend on).
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "|||PHONE_NUMBER|||"),
}

# IP before phone: a dotted quad must never be half-eaten as "ddd.ddd.dddd"
# digits; email first so "user@host" digits never feed the phone pattern.
_PII_ORDER = ("email", "ip", "phone")


def pii_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII occurrence counts (pure Catalyst — regexp over the
    scan, no shuffle at all): n_emails, n_ips, n_phones."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS["email"][0]), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS["ip"][0]), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS["phone"][0]), 0)).alias("n_phones"),
    )


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Mask emails, IPs, and phone numbers in place (chained
    ``regexp_replace`` in a fixed order — one codegen projection, runs at
    scan speed over 100 TB). Returns (id, per-class counts, redacted)."""
    out = pii_signals(df, id_col, text_col).join(df.select(id_col, text_col), id_col)
    red = F.col(text_col)
    for key in _PII_ORDER:
        pat, token = PII_PATTERNS[key]
        red = F.regexp_replace(red, pat, token)
    return out.select(
        id_col, "n_emails", "n_ips", "n_phones", red.alias("redacted")
    )


# --- URL-level filtering (RefinedWeb/C4-style pre-fetch curation) ----------
#
# Small deterministic default inventories; production deployments swap in
# their own lists (the UT1 blocklist etc.) — the operator shape is the point.
URL_BLOCKED_SUFFIXES = [".casino.test", ".spamfarm.test"]
URL_BADWORDS = ["phishing", "malware", "clickbait"]
URL_NON_CONTENT_EXTS = [
    ".css", ".js", ".ico", ".woff", ".woff2", ".ttf", ".map", ".svg",
]


def url_filters(
    df: DataFrame,
    url_col: str = "url",
    blocked_suffixes: list[str] | None = None,
    badwords: list[str] | None = None,
    non_content_exts: list[str] | None = None,
) -> DataFrame:
    """URL-level curation verdict (the RefinedWeb/C4 pre-fetch screen):
    classify every URL before spending a fetch on it. First-match-wins
    reason chain, same style as the detector chain and clean_corpus:

    - ``blocked_domain`` — host equals or ends with a blocklist entry
      (suffix match on '.'-boundary, so 'evil.casino.test' matches
      '.casino.test' but 'notcasino.test' does not).
    - ``badword`` — a configured substring appears anywhere in the
      lowercased URL (the C4 word-list screen).
    - ``non_content`` — the path ends in an asset extension that never
      yields training text (css/js/fonts/sourcemaps).

    Pure projection — map-only at any scale, run it BEFORE the frontier
    seen anti-join so blocked URLs never occupy ledger space. Adds
    ``url_drop_reason`` (NULL = fetchable) and ``url_ok``."""
    u = F.col(url_col)
    low = F.lower(u)
    host = F.lower(F.coalesce(F.parse_url(u, F.lit("HOST")), F.lit("")))
    path = F.lower(F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit("")))
    reason = F.lit(None).cast("string")
    chain = F.when(F.lit(False), F.lit(""))  # seed the when-chain
    for s in blocked_suffixes if blocked_suffixes is not None else URL_BLOCKED_SUFFIXES:
        s = s.lower()
        bare = s.lstrip(".")
        chain = chain.when(host.endswith(s) | (host == bare), F.lit("blocked_domain"))
    for w in badwords if badwords is not None else URL_BADWORDS:
        chain = chain.when(low.contains(w.lower()), F.lit("badword"))
    for e in non_content_exts if non_content_exts is not None else URL_NON_CONTENT_EXTS:
        chain = chain.when(path.endswith(e.lower()), F.lit("non_content"))
    reason = chain.otherwise(reason)
    return df.withColumn("url_drop_reason", reason).withColumn(
        "url_ok", reason.isNull()
    )


# --- host/domain reputation (RefinedWeb-style domain-level curation) --------


def host_reputation(
    docs: DataFrame,
    host_col: str = "host",
    ok_col: str = "keep",
    score_col: str | None = None,
) -> DataFrame:
    """Per-host rollup of document-level quality verdicts → a host-level
    reputation, the aggregate form of domain filtering used by
    RefinedWeb/C4-class pipelines (drop the whole domain when its sampled
    documents are consistently garbage, instead of paying per-document QC
    on every future fetch).

    Inputs are document rows with a boolean ``ok_col`` (the per-doc keep
    verdict from any QC stage) and optionally a double ``score_col``.
    Output: (host, n_docs, n_keep, keep_rate, mean_score?, reputation)
    where reputation = keep_rate, or keep_rate·mean_score when a score is
    given — both rounded to 6 so cross-engine float folds agree.

    Scale shape: ONE partial-agg groupBy(host); output rows = distinct
    hosts. Feeds ``screen_by_host_reputation`` (and, upstream of fetch,
    the same table can drive `url_filters`-style prefetch drops)."""
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(ok_col).cast("long")).alias("n_keep"),
    ]
    if score_col is not None:
        aggs.append(F.avg(F.col(score_col)).alias("mean_score"))
    out = docs.groupBy(F.col(host_col).alias("host")).agg(*aggs).withColumn(
        "keep_rate", F.round(F.col("n_keep") / F.col("n_docs"), 6)
    )
    rep = (
        F.col("keep_rate") * F.col("mean_score")
        if score_col is not None
        else F.col("keep_rate")
    )
    return out.withColumn("reputation", F.round(rep, 6))


def screen_by_host_reputation(
    docs: DataFrame,
    reputation: DataFrame,
    min_reputation: float,
    host_col: str = "host",
) -> DataFrame:
    """Drop every document whose host's reputation is below the floor.
    The blocklist side is filtered reputation rows (≤ #distinct-hosts,
    and only the sub-floor subset of that) — broadcast anti-join, the
    same shape as the prefetch URL screen. Hosts absent from the
    reputation table are KEPT (no evidence ≠ bad)."""
    bad = reputation.filter(F.col("reputation") < min_reputation).select(
        F.col("host").alias(host_col)
    )
    return docs.join(F.broadcast(bad), host_col, "left_anti")


# --- token-budget mixture planning (Pile/Dolma-style source mixing) ---------


def token_budget_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    max_epochs: float = 1.0,
) -> DataFrame:
    """Plan a training mixture: given per-document token counts and target
    source weights (Pile/Dolma-style "X% web, Y% code" recipes), compute
    per-source sampling rates against a total token budget.

    target_tokens(s) = budget · w(s)/Σw; sample_rate(s) = min(max_epochs,
    target/available). ``max_epochs`` > 1 permits upsampling (repeating) a
    scarce source; ``capped`` marks sources whose target is unreachable
    under the cap — the planner makes the shortfall visible instead of
    silently under-delivering the mixture. Sources absent from ``weights``
    get weight 0 (rate 0, never sampled). Rates/targets are rounded (6/2)
    so cross-engine float folds agree.

    Scale shape: ONE partial-agg groupBy(source); output rows = distinct
    sources. Feeds ``materialize_mixture``."""
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to > 0")
    pairs: list = []
    for k, v in sorted(weights.items()):
        pairs.extend([F.lit(k), F.lit(float(v) / total_w)])
    wmap = F.create_map(*pairs)
    avail = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(F.col(tokens_col)).alias("tokens_available")
    )
    out = avail.withColumn(
        "weight", F.coalesce(wmap[F.col("source")], F.lit(0.0))
    ).withColumn(
        "target_tokens", F.round(F.col("weight") * F.lit(float(budget_tokens)), 2)
    )
    raw_rate = F.when(
        F.col("tokens_available") > 0,
        F.col("weight") * F.lit(float(budget_tokens)) / F.col("tokens_available"),
    ).otherwise(F.lit(0.0))
    return (
        out.withColumn("capped", raw_rate > max_epochs)
        .withColumn(
            "sample_rate", F.round(F.least(raw_rate, F.lit(float(max_epochs))), 6)
        )
        .withColumn(
            "planned_tokens",
            F.round(F.col("tokens_available") * F.col("sample_rate"), 0).cast("long"),
        )
    )


def temperature_mixture_rates(
    docs: DataFrame,
    alpha: float,
    budget_tokens: int,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    max_epochs: float = 1.0,
) -> DataFrame:
    """`token_budget_mixture` with the weights computed FROM the data by
    temperature sampling: w(s) ∝ available(s)^α — the multilingual-
    corpus balancing rule (exponential smoothing in XLM-R / mT5: α = 1
    reproduces natural proportions, α = 0 uniform across sources, the
    usual α ≈ 0.3 lifts tail sources without drowning the head). No
    driver-held weights dict: shares are derived in-plan, so the recipe
    tracks the corpus as it grows.

    Output (source, tokens_available, share_r, target_tokens,
    sample_rate, planned_tokens, capped) — same plan surface as
    token_budget_mixture, feeds `materialize_mixture` unchanged.
    Physical shape: ONE partial-agg groupBy(source) + the 1-row Σw^α on
    the constant-key BroadcastHashJoin; rows = distinct sources."""
    from . import join_scalar_frame

    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    avail = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(F.col(tokens_col)).alias("tokens_available")
    )
    w = F.when(
        F.col("tokens_available") > 0,
        F.pow(F.col("tokens_available").cast("double"), F.lit(float(alpha))),
    ).otherwise(F.lit(0.0))
    weighted = avail.withColumn("_w", w)
    tot = weighted.groupBy().agg(F.sum("_w").alias("_tw"))
    out = join_scalar_frame(weighted, tot).withColumn(
        "share_r",
        F.round(
            F.when(F.col("_tw") > 0, F.col("_w") / F.col("_tw")).otherwise(
                F.lit(0.0)
            ),
            6,
        ),
    )
    target = F.when(
        F.col("_tw") > 0, F.col("_w") / F.col("_tw") * float(budget_tokens)
    ).otherwise(F.lit(0.0))
    raw_rate = F.when(
        F.col("tokens_available") > 0, target / F.col("tokens_available")
    ).otherwise(F.lit(0.0))
    return (
        out.withColumn("target_tokens", F.round(target, 2))
        .withColumn("capped", raw_rate > max_epochs)
        .withColumn(
            "sample_rate",
            F.round(F.least(raw_rate, F.lit(float(max_epochs))), 6),
        )
        .withColumn(
            "planned_tokens",
            F.round(
                F.col("tokens_available") * F.col("sample_rate"), 0
            ).cast("long"),
        )
        .drop("_w", "_tw")
    )


def materialize_mixture(
    docs: DataFrame,
    plan: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministically materialize a ``token_budget_mixture`` plan:
    each document appears floor(rate) full times plus one more with
    probability (rate − floor(rate)), decided by the engine-portable md5
    bucket of (id, epoch) — rerun-stable, engine-portable, no RNG.
    Output = input columns + ``epoch`` (0-based copy index; epoch > 0 rows
    are upsampled repeats).

    Scale shape: the plan is O(sources) → broadcast join; the epoch
    explode inflates rows only for upsampled sources (rate > 1); the
    fractional keep is a map-side filter."""
    rates = plan.select(
        F.col("source").alias(source_col), F.col("sample_rate").alias("_rate")
    )
    joined = docs.join(F.broadcast(rates), source_col).filter(F.col("_rate") > 0)
    exploded = joined.withColumn(
        "epoch",
        F.explode(
            F.sequence(F.lit(0), F.ceil(F.col("_rate")).cast("int") - F.lit(1))
        ),
    )
    frac_bucket = col_hash_bucket(
        F.concat(
            F.col(id_col).cast("string"), F.lit("#"), F.col("epoch").cast("string")
        ),
        10000,
    )
    keep = (F.col("epoch") < F.floor(F.col("_rate"))) | (
        frac_bucket < (F.col("_rate") - F.floor(F.col("_rate"))) * 10000
    )
    return exploded.filter(keep).drop("_rate")


# Credit-card candidate shapes — UNAMBIGUOUS patterns only (no optional
# groups inside repetition whose backtracking order Java and RE2 could
# resolve differently — the PII_PATTERNS discipline): uniformly-grouped
# 4x4 PANs and plain 13-19 digit runs.
CC_GROUPED_RE = r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b"
CC_PLAIN_RE = r"\b\d{13,19}\b"
CC_MASK = "|||CREDIT_CARD|||"


def col_luhn_valid(digits: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812 — the PAN check digit) over a
    digits-only string, pure Catalyst: from the RIGHT, double every
    second digit (subtracting 9 when it exceeds 9), sum mod 10 == 0.
    The verifier that separates a real card number from a phone number
    or timestamp that merely looks like one. Empty input is invalid."""
    rev = F.reverse(digits)
    at = lambda i: F.get(F.split(rev, ""), i - 1).cast("int")  # noqa: E731
    terms = F.transform(
        F.sequence(F.lit(1), F.length(rev)),
        lambda i: F.when(i % 2 == 1, at(i)).otherwise(
            F.when(at(i) * 2 > 9, at(i) * 2 - 9).otherwise(at(i) * 2)
        ),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    return (F.length(digits) > 0) & (F.pmod(total, F.lit(10)) == 0)


def credit_card_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc credit-card exposure: (id, n_cc_candidates, n_cc_valid) —
    candidates from the two unambiguous shapes, validity by Luhn. The
    PAN scrub Dolma/ROOTS-class pipelines run beside email/IP/phone
    masking; the Luhn count is the real-exposure metric (most 16-digit
    lookalikes fail it)."""
    body = F.coalesce(F.col(text_col), F.lit(""))
    cands = F.concat(
        F.regexp_extract_all(body, F.lit(CC_GROUPED_RE), F.lit(0)),
        F.regexp_extract_all(body, F.lit(CC_PLAIN_RE), F.lit(0)),
    )
    valid = F.filter(
        F.transform(cands, lambda c: F.regexp_replace(c, r"[ -]", "")),
        lambda d: col_luhn_valid(d),
    )
    return df.select(
        F.col(id_col),
        F.size(cands).alias("n_cc_candidates"),
        F.size(valid).alias("n_cc_valid"),
    )


def redact_credit_cards(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Mask every credit-card CANDIDATE (both shapes) with ``CC_MASK`` —
    conservatively, Luhn or not (a mistyped PAN is still a PAN; the
    Dolma stance). Input columns preserved, ``text`` replaced; pure
    codegen projection chained after `redact_pii`."""
    out = F.regexp_replace(
        F.coalesce(F.col(text_col), F.lit("")), CC_GROUPED_RE, CC_MASK
    )
    out = F.regexp_replace(out, CC_PLAIN_RE, CC_MASK)
    return df.withColumn(text_col, out)
