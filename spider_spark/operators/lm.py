"""Unigram language-model perplexity scoring — the CCNet-style quality
bucketing stage (Wenzek et al. 2020: score every document with an LM,
split the corpus into head/middle/tail perplexity buckets, keep the head).

The production recipe trains KenLM on a trusted corpus (Wikipedia) and
scores the crawl; no LM toolkit exists in this sandbox, so the operator
implements the same dataflow with a smoothed unigram LM trained on a
reference DataFrame — the Spark-side shape (train = one aggregation,
score = broadcast-join + one per-doc aggregation) is exactly what a
KenLM-backed pandas-UDF variant would need, and the unigram path is fully
Catalyst (whole-stage codegen, DuckDB-oracle-checkable).

Scale shape at 100 TB:
- **train**: corpus scan → explode tokens → groupBy(token) count. One
  shuffle with map-side partial aggregation; vocabulary (10^7-10^9 rows)
  is tiny next to the corpus.
- **score**: corpus scan → explode → join vocab → groupBy(doc) mean.
  The vocab side broadcasts under LM_BROADCAST_ROWS (the usual case —
  a pruned LM vocab is ~10^6 rows); above the gate the join shuffles on
  `token`, and callers should pre-prune the vocab (`top_k_vocab`) instead
  of shipping a garbage tail that a real LM would map to <unk> anyway.
- **bucket**: thresholds are either caller-supplied constants (the CCNet
  deployment style: computed once offline) or estimated with
  `percentile_approx` in one extra aggregation — never a global sort.

Reference: the reference library has no corpus scoring (it is a
fetch/extract library); this extends the engine for the training-data
pipeline per the build brief, alongside textqc.clean_corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "col_lm_tokens",
    "unigram_lm",
    "top_k_vocab",
    "doc_cross_entropy",
    "perplexity_buckets",
    "ngram_counts",
    "doc_stupid_backoff",
    "doc_kneser_ney",
]

# Above this many vocab rows, stop broadcasting the LM into the scoring
# join — same gate discipline as frontier.redirect_broadcast_rows.
# ENFORCED in doc_cross_entropy via a limit-bounded count; 2M (token,
# double, double) rows ≈ 80 MB serialized.
LM_BROADCAST_ROWS = 2_000_000


def col_lm_tokens(text_col: str | Column) -> Column:
    """LM tokenization: lowercase, split on whitespace, drop empties —
    deliberately identical to curation.word_ngrams' tokenizer so the LM,
    the decontamination grams, and the token counts all agree on what a
    token is."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != F.lit(""))


def unigram_lm(
    reference: DataFrame, text_col: str = "text", alpha: float = 0.5
) -> DataFrame:
    """Train a Lidstone-smoothed unigram LM on a reference corpus.

    Output: (token, log_prob) with
    ``log_prob = ln((count + alpha) / (total + alpha * (V + 1)))`` —
    the +1 in the denominator reserves mass for the OOV event, whose
    log-prob `unk_log_prob` derives from the same totals.

    One explode + one groupBy (map-side combined); the totals ride a
    broadcast 1-row hash join, so no second pass over the corpus.
    """
    counts = (
        reference.select(F.explode(col_lm_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("v")
    )
    denom = F.col("total") + F.lit(alpha) * (F.col("v") + F.lit(1))
    from . import join_scalar_frame

    return join_scalar_frame(counts, totals).select(
        "token",
        F.log((F.col("c") + F.lit(alpha)) / denom).alias("log_prob"),
        F.log(F.lit(alpha) / denom).alias("unk_log_prob"),
    )


def top_k_vocab(lm: DataFrame, k: int) -> DataFrame:
    """Prune an LM to its k most probable tokens (ties broken by token so
    the pruned vocab is deterministic). Keeps the scoring join
    broadcastable when the raw vocabulary has a garbage long-tail; dropped
    tokens score as OOV, exactly like a real LM's <unk> mapping."""
    w = F.row_number().over(
        Window.orderBy(F.col("log_prob").desc(), F.col("token").asc())
    )
    # single global window over the (small) vocab table, not the corpus
    return lm.withColumn("_r", w).filter(F.col("_r") <= k).drop("_r")


def doc_cross_entropy(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_unk: bool = True,
    broadcast: bool | None = None,
) -> DataFrame:
    """Score every document against the LM: mean negative log-probability
    per token (cross-entropy, nats) and the implied perplexity.

    Output: (id_col, n_tokens, ce_nats, ppl). Empty documents are absent
    (no tokens → nothing to score), matching CCNet which drops empties
    upstream.

    With ``use_unk`` (default) unknown tokens take the LM's reserved
    OOV probability via a left join + coalesce; with ``use_unk=False``
    unknown tokens are skipped (inner join) — only correct when the LM
    was trained on the same corpus being scored.

    With ``broadcast=None`` (the default) the vocab is COUNTED once with a
    limit-bounded probe and broadcast only under LM_BROADCAST_ROWS (the
    measured-gate discipline of frontier.resolve_redirects); above the
    gate the join shuffles on `token` — pre-prune with ``top_k_vocab``
    instead of shipping a garbage tail a real LM would map to <unk>.
    Everything before the per-doc aggregation is then map-side, and the
    single shuffle is the groupBy(id) with partial aggregation (sum/count
    combine before the exchange — the shuffle carries one row per doc per
    map partition).
    """
    if broadcast is None:
        probe = lm.limit(LM_BROADCAST_ROWS + 1).count()
        broadcast = probe <= LM_BROADCAST_ROWS
    side = F.broadcast(lm) if broadcast else lm
    tok = docs.select(
        F.col(id_col), F.explode(col_lm_tokens(text_col)).alias("token")
    )
    if use_unk:
        j = tok.join(side, "token", "left")
        # unk_log_prob is a column of the (broadcast) LM; rows that missed
        # the join need it as a constant — take the LM's first row once.
        unk = lm.select("unk_log_prob").first()
        if unk is None:
            raise ValueError("empty language model")
        lp = F.coalesce(F.col("log_prob"), F.lit(float(unk[0])))
    else:
        j = tok.join(side, "token", "inner")
        lp = F.col("log_prob")
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.avg(lp)).alias("ce_nats"),
        F.exp(-F.avg(lp)).alias("ppl"),
    )


def perplexity_buckets(
    scored: DataFrame,
    thresholds: tuple[float, float] | None = None,
    head_frac: float = 1.0 / 3.0,
    tail_frac: float = 1.0 / 3.0,
    ce_col: str = "ce_nats",
) -> DataFrame:
    """CCNet head/middle/tail assignment: head = lowest cross-entropy
    (most fluent), tail = highest. ``thresholds=(t_head, t_tail)`` pins
    the cut points (the deployment style — computed once, reused across
    shards so the assignment is stable); when absent they are estimated
    from this DataFrame with percentile_approx (one aggregation, no
    global sort).

    Boundary semantics (tested in tests/test_lm.py): cuts are half-open —
    ce == t_head lands in MIDDLE, ce == t_tail lands in TAIL (strict <
    below each cut). Empty documents never reach bucketing: they have no
    tokens, so doc_cross_entropy emits no row for them (CCNet drops
    empties upstream).

    ESTIMATION CAVEAT: percentile_approx is a Greenwald-Khanna sketch
    (accuracy parameter 100 000 → rank error ≤ n/100 000); its cut points
    can differ from an exact quantile (DuckDB's interpolated `quantile`,
    or a full sort) by up to that rank tolerance, and ties AT an estimated
    cut shift whole equal-valued groups between buckets. Oracle-checked
    queries therefore pin explicit thresholds (the deployment style); the
    estimator path is for exploration, not cross-engine parity.
    """
    if thresholds is None:
        row = scored.agg(
            F.percentile_approx(
                ce_col, [float(head_frac), float(1.0 - tail_frac)], 100_000
            ).alias("q")
        ).first()
        thresholds = (float(row["q"][0]), float(row["q"][1]))
    t_head, t_tail = thresholds
    if not (t_head <= t_tail) or not (
        math.isfinite(t_head) and math.isfinite(t_tail)
    ):
        raise ValueError(f"bad thresholds {thresholds}")
    c = F.col(ce_col)
    bucket = (
        F.when(c < F.lit(t_head), F.lit("head"))
        .when(c < F.lit(t_tail), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.withColumn("ppl_bucket", bucket)


def _positions(df: DataFrame, n: int, text_col: str, keep: list[str]) -> DataFrame:
    """Explode each document into its order-n token windows: one row per
    n-gram position, columns w1..wn. Documents shorter than n tokens emit
    nothing (size guard BEFORE sequence() — sequence(0, -1) would count
    DOWN in Spark and fabricate positions). transform+explode stays in
    whole-stage codegen; no Python touches the tokens."""
    fields = ", ".join(f"t[i + {k}] AS w{k + 1}" for k in range(n))
    gen = F.expr(
        f"transform(sequence(0, size(t) - {n}), i -> struct({fields}))"
    )
    toks = df.select(*keep, col_lm_tokens(text_col).alias("t")).filter(
        F.size("t") >= n
    )
    return toks.select(*keep, F.explode(gen).alias("g")).select(
        *keep, *(f"g.w{k + 1}" for k in range(n))
    )


def ngram_counts(reference: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """Order-n n-gram counts over a reference corpus: (w1..wn, c) with c
    as DOUBLE (it only ever feeds ratios). One corpus scan → explode →
    groupBy with map-side partial aggregation — the Brants et al. 2007
    ("Large Language Models in Machine Translation", EMNLP) counting step
    verbatim: at 100 TB this is the same one-shuffle shape as a word
    count, and the count table (≪ corpus) is what ships to scoring."""
    cols = [f"w{k + 1}" for k in range(n)]
    return (
        _positions(reference, n, text_col, [])
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )


def doc_stupid_backoff(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    lidstone: float = 0.5,
    broadcast: bool | None = None,
) -> DataFrame:
    """Per-document Stupid Backoff trigram score (Brants et al. 2007 §4):

        S(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2)          if the trigram occurs
                      = α · c(w2 w3) / c(w2)             else if the bigram does
                      = α² · (c(w3) + λ) / (N + λ(V+1))  otherwise

    — the relative-frequency backoff Google ran as five MapReduce passes
    over 2T tokens; here the counts are three groupBys and scoring is one
    scan of `docs` through five equi-joins against the count tables. The
    base case is Lidstone-floored (same λ discipline as unigram_lm) so an
    OOV token keeps the log finite instead of Brants' score-of-0, which a
    per-doc LOG-average cannot absorb.

    Output: (id_col, n_trigrams, sb_nats) where sb_nats is the mean
    negative log score over the doc's trigram positions — lower is more
    reference-like. Documents with <3 tokens emit no row (no trigram
    positions; same absent-empties contract as doc_cross_entropy).

    Scale shape at 100 TB: counting is 3 shuffles over the REFERENCE
    (which in the CCNet deployment is the small trusted corpus, not the
    crawl); scoring scans `docs` once — with the count tables under the
    broadcast gate every join is map-side and the only corpus shuffle is
    the final groupBy(id). Above the gate the joins shuffle on token
    keys; prune the reference first (the Brants pipeline itself thresholds
    counts) rather than shipping the singleton tail.

    ``broadcast=None`` counts the trigram table with a limit-bounded probe
    (the frontier.resolve_redirects gate discipline) and broadcasts all
    three tables only under LM_BROADCAST_ROWS.
    """
    uni = ngram_counts(reference, 1, text_col)  # (w1, c)
    bi = ngram_counts(reference, 2, text_col)  # (w1, w2, c)
    tri = ngram_counts(reference, 3, text_col)  # (w1, w2, w3, c)
    totals = uni.agg(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).cast("double").alias("v")
    )
    if broadcast is None:
        # tri is the largest of the three by construction
        probe = tri.limit(LM_BROADCAST_ROWS + 1).count()
        broadcast = probe <= LM_BROADCAST_ROWS
    wrap = F.broadcast if broadcast else (lambda d: d)

    pos = _positions(docs, 3, text_col, [id_col])
    j = (
        pos.join(
            wrap(tri.select("w1", "w2", "w3", F.col("c").alias("c3"))),
            ["w1", "w2", "w3"],
            "left",
        )
        .join(
            wrap(bi.select("w1", "w2", F.col("c").alias("ctx2_c"))),
            ["w1", "w2"],
            "left",
        )
        .join(
            wrap(
                bi.select(
                    F.col("w1").alias("w2"), F.col("w2").alias("w3"),
                    F.col("c").alias("c2"),
                )
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            wrap(uni.select(F.col("w1").alias("w2"), F.col("c").alias("ctx1_c"))),
            ["w2"],
            "left",
        )
        .join(
            wrap(uni.select(F.col("w1").alias("w3"), F.col("c").alias("c1"))),
            ["w3"],
            "left",
        )
    )
    from . import join_scalar_frame

    j = join_scalar_frame(j, totals)
    # when c3 matched, ctx2_c necessarily matched (same corpus — a trigram
    # implies its context bigram); likewise c2 → ctx1_c. The CASE order
    # makes the stronger evidence win, exactly Brants' recursion unrolled.
    oov_denom = F.col("n_total") + F.lit(lidstone) * (F.col("v") + F.lit(1.0))
    s = (
        F.when(F.col("c3").isNotNull(), F.col("c3") / F.col("ctx2_c"))
        .when(
            F.col("c2").isNotNull(),
            F.lit(alpha) * F.col("c2") / F.col("ctx1_c"),
        )
        .otherwise(
            F.lit(alpha)
            * F.lit(alpha)
            * (F.coalesce(F.col("c1"), F.lit(0.0)) + F.lit(lidstone))
            / oov_denom
        )
    )
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        (-F.avg(F.log(s))).alias("sb_nats"),
    )


def doc_kneser_ney(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    lidstone: float = 0.5,
    broadcast: bool | None = None,
) -> DataFrame:
    """Per-document interpolated Kneser-Ney bigram cross-entropy (Kneser
    & Ney 1995; Chen & Goodman 1998 eq. 4.26-4.27) — the smoothing KenLM
    implements, i.e. the actual model family behind CCNet's perplexity
    filter, next to `doc_stupid_backoff`'s cheaper relative-frequency
    cousin:

        P(w2 | w1) = [max(c(w1 w2) − D, 0) + D · N1+(w1 •) · Pcont(w2)]
                     / c(w1 •)

    where the lower-order distribution is the CONTINUATION probability
    Pcont(w2) ∝ N1+(• w2) — how many distinct contexts w2 completes,
    not how often it occurs ("francisco" is frequent but follows only
    "san", so KN rightly distrusts it in new contexts — the insight the
    unigram backoff misses).

    Deterministic, engine-portable conventions (mirrored by the SQL
    oracle; any fixed choice works, these keep every log finite):
    - Pcont is Lidstone-floored over the continuation-type space:
      (N1+(• w2) + λ) / (B + λ·(Vc + 1)), B = distinct bigram types,
      Vc = distinct continuation types — so an unseen continuation
      keeps positive mass.
    - An unseen CONTEXT (w1 absent from the reference) carries no
      higher-order evidence at all: P = Pcont(w2), the full back-off.
    - All context counts come from the bigram census (c(w1 •) = Σ_w2
      c(w1 w2) — the KN convention), so the model is self-consistent
      without touching the unigram table.

    Output: (id_col, n_bigrams, kn_nats) — mean −ln P over the doc's
    bigram positions; docs with <2 tokens emit no row (same
    absent-empties contract as the other scorers).

    Scale shape at 100 TB: the census is ONE shuffle over the REFERENCE
    (the small trusted corpus in the CCNet deployment); fertility /
    continuation / totals are partial-agg sweeps over the census, not
    the corpus. Scoring scans `docs` once through three equi-joins
    against census-derived tables — broadcast under LM_BROADCAST_ROWS
    (limit-bounded probe, the frontier.resolve_redirects gate), shuffle
    on token keys above it — and the only corpus shuffle is the final
    groupBy(id).
    """
    if not (0.0 < discount < 1.0):
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    bi = ngram_counts(reference, 2, text_col)  # (w1, w2, c)
    ctx = bi.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).cast("double").alias("fert")
    )
    cont = bi.groupBy(F.col("w2")).agg(
        F.count(F.lit(1)).cast("double").alias("contc")
    )
    totals = bi.agg(
        F.count(F.lit(1)).cast("double").alias("b_types"),
        F.count_distinct("w2").cast("double").alias("vc"),
    )
    if broadcast is None:
        probe = bi.limit(LM_BROADCAST_ROWS + 1).count()
        broadcast = probe <= LM_BROADCAST_ROWS
    wrap = F.broadcast if broadcast else (lambda d: d)

    pos = _positions(docs, 2, text_col, [id_col])
    j = (
        pos.join(wrap(bi.select("w1", "w2", F.col("c").alias("c2"))), ["w1", "w2"], "left")
        .join(wrap(ctx), ["w1"], "left")
        .join(wrap(cont), ["w2"], "left")
    )
    from . import join_scalar_frame

    j = join_scalar_frame(j, totals)
    d = F.lit(discount)
    p_cont = (F.coalesce(F.col("contc"), F.lit(0.0)) + F.lit(lidstone)) / (
        F.col("b_types") + F.lit(lidstone) * (F.col("vc") + F.lit(1.0))
    )
    p = F.when(
        F.col("c1").isNotNull(),
        (
            F.greatest(F.coalesce(F.col("c2"), F.lit(0.0)) - d, F.lit(0.0))
            + d * F.col("fert") * p_cont
        )
        / F.col("c1"),
    ).otherwise(p_cont)
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.avg(F.log(p))).alias("kn_nats"),
    )
