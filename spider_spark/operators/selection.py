"""Data-selection operators for LLM training corpora: hashed-feature
linear quality classifiers and DSIR importance weights.

The two standard ways a web-scale pipeline decides WHICH cleaned documents
to keep (after the rule-based QC in textqc.py has removed garbage):

- **linear quality classifier** (the CCNet/GPT-3/LLaMA "looks like
  Wikipedia" filter, public description in Brown et al. 2020 §A and
  Touvron et al. 2023): a fastText-style linear model over hashed token
  features. ``train_token_weights`` fits naive-Bayes log-odds weights from
  a labeled positive/negative corpus as ONE aggregation (no SGD — the
  closed-form member of the same linear family, deterministic and
  engine-portable); ``linear_quality_score`` applies any (bucket, weight)
  table: score = bias + mean over tokens of w[bucket(token)], prob =
  sigmoid(score).
- **DSIR** (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): log importance weight of a doc =
  Σ_features log p̂_target(b) − log q̂_raw(b) over hashed n-gram buckets,
  with add-α smoothing on both distributions. Documents are then kept by
  Gumbel-top-k on the log weights; here the deterministic weight
  computation is the operator, sampling composes with
  curation.stratified_hash_sample.

Feature hashing uses the same md5-based engine-portable bucket trick as
curation.col_hash_bucket — NOT xxhash64 — so a DuckDB/Python oracle
reproduces bucket assignment bit-for-bit. At real scale the md5 projection
is still codegen (Spark's built-in md5), one pass, no shuffle.

Scale shape (100 TB): tokenize/bucket is a projection; the census
(groupBy bucket) partial-aggregates into at most n_buckets rows; scoring
joins the exploded token stream against a weight table that broadcasts
under a measured count gate (the lm.py/curation.py discipline) and
shuffles on bucket above it. No windows, no collect, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# broadcast gate for weight/distribution tables: ENFORCED via a
# limit-bounded count (deciding costs O(gate) rows, never a full scan).
# 2^20 hashed buckets × (long, double) ≈ 16 MB — comfortably broadcastable;
# callers pinning broadcast=True/False skip the probe.
SELECTION_BROADCAST_ROWS = 4_000_000


def _tokens(text_col: str) -> Column:
    """Lowercased whitespace tokens — the corpus-wide convention
    (textqc.token_stats, dedup shingles) so every operator sees the same
    token stream."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )


def token_bucket(token: Column, n_buckets: int) -> Column:
    """Engine-portable hash bucket of a token: first 8 hex chars of md5 →
    int → mod (curation.col_hash_bucket's trick, applied to tokens)."""
    h = F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")
    return (h % F.lit(n_buckets)).cast("int")


def _feature_stream(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int,
    include_bigrams: bool = False,
) -> DataFrame:
    """(id, bucket) rows: one per token occurrence (and per bigram
    occurrence when ``include_bigrams`` — DSIR's hashed unigram+bigram
    feature set). Occurrences, not distincts: both the classifier mean and
    the DSIR sum are over the token stream."""
    toks = _tokens(text_col)
    feats = toks
    if include_bigrams:
        bi = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        feats = F.concat(toks, bi)
    return docs.select(F.col(id_col).alias("id"), F.explode(feats).alias("feat")).select(
        "id", token_bucket(F.col("feat"), n_buckets).alias("bucket")
    )


def train_token_weights(
    pos_docs: DataFrame,
    neg_docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1 << 16,
    alpha: float = 1.0,
) -> DataFrame:
    """Closed-form linear weights from a labeled corpus: per hashed bucket,
    the smoothed naive-Bayes log-odds

        w_b = log (pos_b + α)/(pos_total + α·B) − log (neg_b + α)/(neg_total + α·B)

    Returns (bucket, weight). One census aggregation per class — at most
    ``n_buckets`` output rows regardless of corpus size. The bias term that
    makes this a complete NB classifier (log class prior minus the α-mass
    correction) is the caller's to choose; for filtering pipelines the
    decision threshold is tuned downstream anyway."""
    pos = (
        _feature_stream(pos_docs.select(F.lit(0).alias("_id"), text_col), "_id", text_col, n_buckets)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("pos_n"))
    )
    neg = (
        _feature_stream(neg_docs.select(F.lit(0).alias("_id"), text_col), "_id", text_col, n_buckets)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("neg_n"))
    )
    joined = pos.join(neg, "bucket", "full").select(
        "bucket",
        F.coalesce("pos_n", F.lit(0)).alias("pos_n"),
        F.coalesce("neg_n", F.lit(0)).alias("neg_n"),
    )
    # totals via a 1-row broadcast hash join (map-side; both sides tiny)
    totals = joined.agg(
        F.sum("pos_n").alias("pos_tot"), F.sum("neg_n").alias("neg_tot")
    )
    b = float(n_buckets)
    from . import join_scalar_frame

    return join_scalar_frame(joined, totals).select(
        "bucket",
        (
            F.log((F.col("pos_n") + alpha) / (F.col("pos_tot") + alpha * b))
            - F.log((F.col("neg_n") + alpha) / (F.col("neg_tot") + alpha * b))
        ).alias("weight"),
    )


def _gated_broadcast(df: DataFrame, broadcast: bool | None) -> DataFrame:
    if broadcast is None:
        probe = df.limit(SELECTION_BROADCAST_ROWS + 1).count()
        broadcast = probe <= SELECTION_BROADCAST_ROWS
    return F.broadcast(df) if broadcast else df


def linear_quality_score(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 16,
    bias: float = 0.0,
    broadcast: bool | None = None,
) -> DataFrame:
    """Apply a (bucket, weight) linear model to every document:

        raw = bias + (Σ_tokens w[bucket(token)]) / n_tokens
        prob = sigmoid(raw)

    Unseen buckets contribute 0 (the join is left). Empty docs score
    sigmoid(bias). Output (id, n_tokens, raw_score, prob)."""
    stream = _feature_stream(docs, id_col, text_col, n_buckets)
    w = _gated_broadcast(weights.select("bucket", "weight"), broadcast)
    per_doc = (
        stream.join(w, "bucket", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum(F.coalesce("weight", F.lit(0.0))).alias("w_sum"),
        )
    )
    base = docs.select(F.col(id_col).alias("id")).join(per_doc, "id", "left")
    raw = F.lit(bias) + F.coalesce(F.col("w_sum") / F.col("n_tokens"), F.lit(0.0))
    return base.select(
        "id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        raw.alias("raw_score"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-raw))).alias("prob"),
    )


def dsir_log_weights(
    docs: DataFrame,
    target_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 16,
    alpha: float = 1.0,
    include_bigrams: bool = True,
    broadcast: bool | None = None,
) -> DataFrame:
    """DSIR log importance weights (Xie et al. 2023): for each raw doc,

        log w(doc) = Σ_features [ log p̂_target(b) − log q̂_raw(b) ]

    where p̂/q̂ are add-α-smoothed hashed n-gram (unigram+bigram)
    distributions of the target corpus and the raw corpus respectively.
    Output (id, n_feats, log_weight). Resample downstream with Gumbel
    top-k or a hash-deterministic threshold."""
    raw_stream = _feature_stream(docs, id_col, text_col, n_buckets, include_bigrams)
    # the stream feeds BOTH the q̂ census and the final per-doc join — one
    # persisted materialization instead of re-running the explode per branch
    raw_stream = raw_stream.persist()
    tgt_stream = _feature_stream(
        target_docs.select(F.lit(0).alias("_id"), text_col), "_id", text_col,
        n_buckets, include_bigrams,
    )
    b = float(n_buckets)
    q_cnt = raw_stream.groupBy("bucket").agg(F.count(F.lit(1)).alias("qn"))
    p_cnt = tgt_stream.groupBy("bucket").agg(F.count(F.lit(1)).alias("pn"))
    # totals ride in as broadcast 1-row frames (zero extra actions — the
    # floor for a bucket absent from one side is the same smoothed formula
    # with count 0, so no driver-side total is ever needed)
    q_tot = q_cnt.agg(F.sum("qn").alias("qtot"))
    p_tot = p_cnt.agg(F.sum("pn").alias("ptot"))
    from . import join_scalar_frame

    ratios = (
        join_scalar_frame(
            join_scalar_frame(q_cnt.join(p_cnt, "bucket", "full"), q_tot), p_tot
        )
        .select(
            "bucket",
            (
                F.log((F.coalesce("pn", F.lit(0)) + alpha) / (F.col("ptot") + alpha * b))
                - F.log((F.coalesce("qn", F.lit(0)) + alpha) / (F.col("qtot") + alpha * b))
            ).alias("log_ratio"),
        )
    )
    # ratios has ≤ n_buckets rows by construction — the broadcast decision
    # is static, no probe action required
    if broadcast is None:
        broadcast = n_buckets <= SELECTION_BROADCAST_ROWS
    r = F.broadcast(ratios) if broadcast else ratios
    per_doc = (
        raw_stream.join(r, "bucket", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_feats"),
            F.sum("log_ratio").alias("log_weight"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )
