"""Inverted index construction + TF-IDF term scoring — the
search-engine half of a crawler (every large crawl feeds an indexer;
Common Crawl's columnar index and classic IR pipelines both reduce to
these two tables), and the keyword-extraction primitive curation
pipelines use for topic tagging.

Shapes, 100 TB first:

- **postings** (term, doc_id, tf): one explode over tokenized text,
  partial-agg combined per partition before the (term, doc) shuffle —
  the shuffle is bounded by distinct (doc, term) pairs, not token
  occurrences.
- **document frequency / IDF**: one more partial-agg census keyed on
  term. Smoothed idf = ln((N+1)/(df+1)) + 1 (sklearn's smooth-idf
  formula — public knowledge, engine-portable, never divides by zero).
  The corpus size N rides the 1-row constant-key BroadcastHashJoin
  (`join_scalar_frame`), never a nested loop.
- **top-k terms per doc**: a row_number window partitioned by doc_id.
  Per-doc term counts are bounded by document length — there is no
  hot-key risk analogous to hosts, so a plain window is the right
  plan (documented contrast with the salted two-phase host top-k).

Ties break by (tfidf DESC, term ASC) so results are deterministic and
identical on every engine; scores are rounded for cross-engine float
comparison.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import join_scalar_frame


def col_index_tokens(text_col: str | Column) -> Column:
    """Lowercased alphanumeric index terms (letters/digits runs) — the
    classic IR tokenizer, deliberately simpler than the QC tokenizers
    so the oracle can restate it exactly."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(
        F.lower(F.coalesce(c, F.lit(""))), F.lit(r"([a-z0-9]+)"), 1
    )


def postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The inverted-index fact table: (term, doc_id, tf)."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(col_index_tokens(text_col)).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def document_frequency(post: DataFrame) -> DataFrame:
    """(term, df) — one partial-agg census over the postings."""
    return post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document: (doc_id, term, tf, tfidf_r,
    rank). tfidf = tf · (ln((N+1)/(df+1)) + 1), rounded to 6.

    Ranking happens on the ROUNDED score (then term ASC): Spark's
    Math.log and DuckDB's libm log may differ in the last ulp, and
    ranking the raw doubles would let that flip an ordering — ranking
    the rounded value keeps the window deterministic wherever the two
    engines agree to 6 decimals."""
    post = postings(docs, id_col, text_col)
    n = docs.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        join_scalar_frame(post.join(document_frequency(post), "term"), n)
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf_r"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_r").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "tfidf_r", "rank")
    )


def bm25_scores(
    docs: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(doc, term) BM25 partial scores — the retrieval-grade
    replacement for raw TF-IDF (Robertson & Zaragoza 2009; the idf is
    Lucene's non-negative ln(1 + (N−df+0.5)/(df+0.5)) variant).

    score(d,t) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    dl = Σ tf per doc (token count under the index tokenizer); avgdl =
    total tokens / N over ALL docs (empty docs count as length 0, so the
    constant is derivable from the corpus without a second schema). Both
    corpus constants ride ONE 1-row constant-key BroadcastHashJoin; dl
    joins back on doc_id — everything else is the postings shuffle
    ``postings`` already pays. Returns (doc_id, term, tf, bm25_r)."""
    post = postings(docs, id_col, text_col)
    dl = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    consts = join_scalar_frame(
        docs.groupBy().agg(F.count(F.lit(1)).alias("n_docs")),
        post.groupBy().agg(F.coalesce(F.sum("tf"), F.lit(0)).alias("tot_tokens")),
    )
    scored = join_scalar_frame(
        post.join(document_frequency(post), "term").join(dl, "doc_id"), consts
    )
    avgdl = F.col("tot_tokens") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    return scored.select(
        "doc_id",
        "term",
        "tf",
        F.round(
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)),
            6,
        ).alias("bm25_r"),
    )


def bm25_scores_from_postings(
    post: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """``bm25_scores`` computed from a (term, doc_id, tf) postings table
    alone — the standing-index serving path (``Crawler.update_index``
    maintains exactly this table): dl, df, N and avgdl all derive from
    the postings, so scoring never touches raw text again. One caveat
    vs the docs form, stated not hidden: documents whose text tokenizes
    to NOTHING carry no postings row, so N counts docs with ≥1 term —
    identical scores whenever every doc has at least one token.
    Returns (doc_id, term, tf, bm25_r)."""
    dl = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    consts = join_scalar_frame(
        post.select("doc_id").distinct().groupBy().agg(
            F.count(F.lit(1)).alias("n_docs")
        ),
        post.groupBy().agg(
            F.coalesce(F.sum("tf"), F.lit(0)).alias("tot_tokens")
        ),
    )
    scored = join_scalar_frame(
        post.join(document_frequency(post), "term").join(dl, "doc_id"), consts
    )
    avgdl = F.col("tot_tokens") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    return scored.select(
        "doc_id",
        "term",
        "tf",
        F.round(
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)),
            6,
        ).alias("bm25_r"),
    )


def merge_postings(
    old_postings: DataFrame,
    delta_docs: DataFrame,
    deleted_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental index maintenance — the per-tick discipline: a
    recrawl tick yields a small set of changed/new documents and a set
    of deletions (gone/410 URLs); rebuilding the full postings table per
    tick is the scale-killer this avoids. Invariant (asserted by the
    oracle-backed entry query and tests): merged postings are EXACTLY
    the postings of the corpus with delta texts substituted and deleted
    ids removed.

    Physical shape: the old postings are anti-joined against the
    (changed ∪ deleted) id set — shuffle ∝ |old| keyed on doc_id, and
    with both snapshots bucketed by doc_id it is co-located — then
    unioned with the delta's freshly tokenized postings (shuffle ∝
    delta, not corpus). Document frequencies are NOT stored — they
    derive from one census over the merged table when scoring needs
    them (``tfidf_top_terms``/``bm25_scores`` already recompute)."""
    gone = delta_docs.select(F.col(id_col).alias("doc_id"))
    live_delta = delta_docs
    if deleted_ids is not None:
        dele = deleted_ids.select(F.col(id_col).alias("doc_id")).distinct()
        gone = gone.unionByName(dele)
        # a doc both refreshed and deleted is DELETED — a tick's 410 beats
        # its earlier 200, same as the ledger's latest-capture discipline
        live_delta = delta_docs.join(
            dele.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
        )
    kept = old_postings.join(gone.distinct(), "doc_id", "left_anti")
    fresh = postings(live_delta, id_col, text_col)
    return kept.unionByName(fresh)


def bm25_query_scores(
    docs: DataFrame,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    scores: DataFrame | None = None,
) -> DataFrame:
    """Summed BM25 over the query's distinct terms for EVERY matching
    document (bag-of-words disjunction) — the per-doc relevance signal
    ``bm25_search`` ranks and focused crawling propagates to outlinks.
    The term filter is an IN-list literal pushed into the postings
    aggregation, so only matching (term, doc) pairs ever shuffle.
    Returns (doc_id, score_r); docs matching no term are absent.

    ``scores``: a precomputed ``bm25_scores`` table (the materialized
    impact index a serving tier maintains next to the postings) — when
    given, ``docs`` is never touched and the per-query cost is the
    IN-list scan of that table instead of re-tokenizing the corpus."""
    terms = sorted(set(re.findall(r"[a-z0-9]+", query.lower())))
    if not terms:
        raise ValueError("bm25 needs at least one indexable query term")
    if scores is None:
        scores = bm25_scores(docs, k1=k1, b=b, id_col=id_col, text_col=text_col)
    return (
        scores.where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.round(F.sum("bm25_r"), 6).alias("score_r"))
    )


def bm25_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    scores: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents for a free-text query by summed BM25 (the classic
    first-stage ranker). The global top-k is orderBy(...).limit(k) —
    Spark plans TakeOrderedAndProject (per-partition heaps + a k-row
    driver merge), NEVER a single-partition global-window sort over all
    matching docs. The rank column is a window over the ≤k survivors
    only. Deterministic: ranked on the ROUNDED total then doc_id.
    Returns (doc_id, score_r, rank)."""
    topk = (
        bm25_query_scores(
            docs, query, k1=k1, b=b, id_col=id_col, text_col=text_col,
            scores=scores,
        )
        .orderBy(F.col("score_r").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score_r").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score_r", "rank"
    )


def passage_postings(
    docs: DataFrame,
    passage_tokens: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Passage-level inverted index: (doc_id, p_idx, term, tf) with
    passages = fixed non-overlapping windows of ``passage_tokens`` index
    tokens (p_idx = token position div passage_tokens — position comes
    from posexplode, so the split is a pure projection; no second
    tokenizer, no UDF). Per-doc passage count is bounded by doc length,
    so the (doc_id, p_idx, term) census inherits postings' skew-free
    partial-agg shape."""
    if passage_tokens < 1:
        raise ValueError("passage_tokens must be >= 1")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(col_index_tokens(text_col)).alias("pos", "term"),
    )
    return (
        toks.withColumn("p_idx", F.expr(f"pos div {int(passage_tokens)}"))
        .groupBy("doc_id", "p_idx", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_maxp_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    passage_tokens: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by MAX passage BM25 — passage-level evidence
    (Callan SIGIR'94; the MaxP aggregation of Dai & Callan SIGIR'19):
    long documents are scored by their best ``passage_tokens``-token
    window instead of their whole bag of words, so one relevant passage
    buried in a 100-page PDF outranks a long document's diluted tf. The
    BM25 universe is the PASSAGE corpus: df counts passages containing
    the term, dl/avgdl are passage lengths, N = passage count.

    Returns (doc_id, score_r, best_p, rank): score_r = the max passage
    score (rounded per-term like bm25_scores, summed, re-rounded),
    best_p = the LOWEST passage index among score ties (struct-max
    with negated p_idx — engine-portable argmax, same trick as the
    (score,label) argmax in langid). Global top-k is
    orderBy().limit(k) — TakeOrderedAndProject, never a global window;
    rank is a window over the ≤k survivors.

    Physical shape: the passage census + three partial-agg censuses
    (passage dl, per-term passage df filtered to the query's IN-list,
    corpus constants on the 1-row constant-key broadcast) + one
    partial-agg max per doc. Everything is bounded by passage counts —
    no window ever sees more than one doc's passages, and only
    query-term postings shuffle past the census."""
    terms = sorted(set(re.findall(r"[a-z0-9]+", query.lower())))
    if not terms:
        raise ValueError("bm25 needs at least one indexable query term")
    post = passage_postings(docs, passage_tokens, id_col, text_col)
    dl = post.groupBy("doc_id", "p_idx").agg(F.sum("tf").alias("dl"))
    consts = dl.groupBy().agg(
        F.count(F.lit(1)).alias("n_pass"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("tot_tokens"),
    )
    qpost = post.filter(F.col("term").isin(terms))
    df_t = qpost.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = join_scalar_frame(
        qpost.join(df_t, "term").join(dl, ["doc_id", "p_idx"]), consts
    )
    avgdl = F.col("tot_tokens") / F.col("n_pass")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_pass") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    per_term = scored.select(
        "doc_id",
        "p_idx",
        F.round(
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)),
            6,
        ).alias("bm25_r"),
    )
    p_scores = per_term.groupBy("doc_id", "p_idx").agg(
        F.round(F.sum("bm25_r"), 6).alias("p_score_r")
    )
    best = p_scores.groupBy("doc_id").agg(
        F.max(F.struct(F.col("p_score_r"), (-F.col("p_idx")).alias("np")))
        .alias("_m")
    )
    docs_scored = best.select(
        "doc_id",
        F.col("_m.p_score_r").alias("score_r"),
        (-F.col("_m.np")).cast("long").alias("best_p"),
    )
    topk = docs_scored.orderBy(
        F.col("score_r").desc(), F.col("doc_id").asc()
    ).limit(k)
    w = Window.orderBy(F.col("score_r").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score_r", "best_p", "rank"
    )


def bm25_term_upper_bounds(
    scores: DataFrame,
) -> DataFrame:
    """Per-term BM25 upper bounds over a (doc_id, term, bm25_r) score
    table: ub(t) = max_d score(d,t) — the precomputed impact ceilings
    WAND/MaxScore pruning is built on (Broder et al. 2003). One
    partial-agg census; at scale this is maintained next to the postings
    and refreshed by the same incremental merge."""
    return scores.groupBy("term").agg(F.max("bm25_r").alias("ub"))


# rounding guard for the MaxScore prune: per-term scores are rounded to
# 6 dp, so a doc's rounded sum can exceed the true sum by < 5e-7 per term;
# pruning strictly below (θ − margin) keeps the prune sound under rounding
_MAXSCORE_EPS = 1e-5


def maxscore_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    scores: DataFrame | None = None,
) -> DataFrame:
    """Top-k by summed BM25 with MaxScore pruning (Turtle & Flood 1995;
    the document-at-a-time WAND family, Broder et al. 2003) — returns
    EXACTLY what ``bm25_search`` returns (same schema, same rows, same
    tie-break; asserted by tests and the oracle), but never aggregates
    the full matching-doc set:

    1. upper bounds ub(t) per query term (≤ |query terms| rows — driver-
       bounded by the user's query string, the centroid-literal contract);
    2. a threshold θ = k-th exact score among the ≤k docs seeded from the
       highest-ub term's top single contributions (every exact top-k
       score is ≥ θ because those seeds' scores are lower bounds);
    3. terms split MaxScore-style: the largest ub-ascending prefix whose
       ub sum stays below θ is NON-ESSENTIAL — a doc matching only those
       terms cannot reach θ. Candidates = docs matching ≥1 essential
       term; only candidate rows (essential AND non-essential) enter the
       final per-doc aggregation, so the doc-keyed shuffle is ∝
       essential-term postings, not the query's full OR — the saving
       that matters when a rare term is ANDed with stopword-ish ones.

    The candidate filter is a semi-join on ids (broadcastable when the
    essential postings are small; id-keyed either way). Prune decisions
    use a 1e-5 margin under θ so 6-dp score rounding can never evict a
    true top-k tie. Falls back to no pruning (θ=0) when fewer than k
    seeds exist — still exact, just unpruned."""
    terms = sorted(set(re.findall(r"[a-z0-9]+", query.lower())))
    if not terms:
        raise ValueError("maxscore needs at least one indexable query term")
    if k < 1:
        raise ValueError("k must be >= 1")
    scores_q = (
        (bm25_scores(docs, k1=k1, b=b, id_col=id_col, text_col=text_col)
         if scores is None else scores)
        .where(F.col("term").isin(terms))
        .persist()
    )
    # (1) impact ceilings — bounded by the query's term count
    ub_rows = bm25_term_upper_bounds(scores_q).collect()
    ub = {r["term"]: float(r["ub"]) for r in ub_rows}
    if not ub:
        return (
            scores_q.groupBy("doc_id")
            .agg(F.round(F.sum("bm25_r"), 6).alias("score_r"))
            .withColumn("rank", F.lit(1))
            .where(F.lit(False))
            .select("doc_id", "score_r", "rank")
        )
    # (2) θ from the best term's postings: top-k single contributions are
    # lower bounds on those docs' exact scores
    t_star = max(ub, key=lambda t: (ub[t], t))
    seed_ids = (
        scores_q.where(F.col("term") == t_star)
        .orderBy(F.col("bm25_r").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id")
    )
    seed_scores = [
        r["s"]
        for r in scores_q.join(F.broadcast(seed_ids), "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.round(F.sum("bm25_r"), 6).alias("s"))
        .collect()
    ]
    theta = sorted(seed_scores, reverse=True)[k - 1] if len(seed_scores) >= k else 0.0
    # (3) MaxScore term split: ub-ascending prefix summing under θ−ε is
    # non-essential
    essential: list[str] = []
    acc = 0.0
    for t in sorted(ub, key=lambda t: (ub[t], t)):
        acc += ub[t]
        if acc >= theta - _MAXSCORE_EPS:
            essential.append(t)
    cand = (
        scores_q.where(F.col("term").isin(essential))
        .select("doc_id")
        .distinct()
    )
    topk = (
        scores_q.join(cand, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.round(F.sum("bm25_r"), 6).alias("score_r"))
        .orderBy(F.col("score_r").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score_r").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score_r", "rank"
    )


def bm25f_search(
    docs: DataFrame,
    query: str,
    fields: list[tuple[str, float, float]] | None = None,
    k: int = 10,
    k1: float = 1.2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Simple BM25F (Robertson, Zaragoza & Taylor, CIKM 2004): the
    field-weighted ranker that made anchor text the strongest web-search
    signal — per-field term frequencies are length-normalized, weighted,
    SUMMED into one pseudo-frequency, then saturated once:

        tf̃(t,d) = Σ_f w_f · tf_f(t,d) / B_f,
        B_f = 1 − b_f + b_f · l_f(d)/avgl_f,
        score(d) = Σ_t idf(t) · tf̃ / (k1 + tf̃)

    (the paper's point: weight INSIDE the saturation — boosting a field
    by repeating the whole-doc score breaks saturation). idf is the
    Lucene non-negative form with df = docs matching the term in ANY
    field. ``fields`` is [(text_col, weight, b)], default
    [("text", 1.0, 0.75), ("anchor_text", 2.0, 0.75)] — the body+anchor
    pair, anchors boosted 2× per web-search convention.

    Scale shape: one postings shuffle per field (each ∝ its own token
    stream; the anchor field is typically tiny), term-filtered by the
    query IN-list before any join; per-field length/avg constants ride
    1-row scalar hash-joins; the field combine is a (doc,term)-keyed
    union + partial agg; global top-k is TakeOrderedAndProject. Returns
    (doc_id, score_r, rank), deterministic ties on doc_id."""
    if fields is None:
        fields = [("text", 1.0, 0.75), ("anchor_text", 2.0, 0.75)]
    terms = sorted(set(re.findall(r"[a-z0-9]+", query.lower())))
    if not terms:
        raise ValueError("bm25f needs at least one indexable query term")
    if not fields:
        raise ValueError("bm25f needs at least one field")
    from . import join_scalar_frame

    n_docs_frame = docs.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    combined = None
    for text_col, w, b in fields:
        post = postings(docs, id_col, text_col)
        dl = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        tot = post.groupBy().agg(
            F.coalesce(F.sum("tf"), F.lit(0)).alias("tot_tokens")
        )
        leg = join_scalar_frame(
            post.where(F.col("term").isin(terms)).join(dl, "doc_id"),
            join_scalar_frame(n_docs_frame, tot),
        )
        avgl = F.col("tot_tokens") / F.col("n_docs")
        bf = F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgl
        leg = leg.select(
            "doc_id",
            "term",
            (F.lit(float(w)) * F.col("tf") / bf).alias("_wtf"),
        )
        combined = leg if combined is None else combined.unionByName(leg)
    pseudo = combined.groupBy("doc_id", "term").agg(
        F.sum("_wtf").alias("_tft")
    )
    # df over ANY field: distinct (doc, term) across the query-filtered
    # pseudo-frequency table IS that census (a term absent everywhere has
    # no row)
    df_any = pseudo.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = join_scalar_frame(pseudo.join(df_any, "term"), n_docs_frame)
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    per_doc = (
        scored.select(
            "doc_id",
            (idf * F.col("_tft") / (F.lit(k1) + F.col("_tft"))).alias("_s"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score_r"))
    )
    topk = per_doc.orderBy(F.col("score_r").desc(), F.col("doc_id").asc()).limit(k)
    w_rank = Window.orderBy(F.col("score_r").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w_rank)).select(
        "doc_id", "score_r", "rank"
    )


def batch_bm25_topk(
    scores: DataFrame,
    queries: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    text_col: str = "q",
) -> DataFrame:
    """Top-k for a whole QUERY BATCH in one plan — the serving shape for
    query logs and offline eval sweeps, and the reason a distributed
    engine beats query-at-a-time here: N queries as N sequential jobs pay
    N driver round-trips of pure latency (Amdahl's serial term — measured
    as the search pipeline's scaling ceiling before this operator), while
    one broadcast join + one partial agg + one per-query window amortizes
    everything.

    ``queries``: (query_id, q free-text); tokenized JVM-side (same
    tokenizer as the corpus), distinct terms per query, broadcast against
    the impact table. The rank window partitions by query_id over that
    query's MATCHING docs — fine for specific queries; for stop-wordy
    logs screen terms by df first (the more_like_this discipline) or the
    window inherits the full corpus. Returns (query_id, doc_id, score_r,
    rank ≤ k), ties toward smaller doc_id."""
    if k < 1:
        raise ValueError("k must be >= 1")
    qterms = queries.select(
        F.col(query_col).alias("query_id"),
        F.explode(F.array_distinct(col_index_tokens(text_col))).alias("term"),
    )
    per = (
        scores.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("bm25_r"), 6).alias("score_r"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_r").desc(), F.col("doc_id").asc()
    )
    return (
        per.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_r", "rank")
    )


def bm25_search_prf(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k_fb: int = 5,
    n_expand: int = 5,
    beta: float = 0.4,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    scores: DataFrame | None = None,
) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (Rocchio 1971 reduced to its
    deterministic two-pass core; Manning IIR §9.1): assume the first
    pass's top-``k_fb`` docs are relevant, harvest their ``n_expand``
    strongest non-query terms (by summed BM25 contribution within the
    feedback set, ties term ASC), and rescore with the expanded query —
    original terms at weight 1, expansion terms at ``beta``. The classic
    recall lever when queries underspecify (crawl operators searching an
    incident by two keywords get the co-occurring vocabulary for free).

    Entirely DataFrame-composed — the expansion terms flow into pass 2
    as a broadcast join, never a driver literal. Cost: pass 1's scoring
    + one feedback-scoped agg + pass 2 over (query ∪ expansion)-term
    postings. ``scores`` reuses a materialized impact index for both
    passes. Returns (doc_id, score_r, rank)."""
    if k_fb < 1 or n_expand < 0:
        raise ValueError("k_fb must be >= 1 and n_expand >= 0")
    if beta < 0:
        raise ValueError("beta must be >= 0")
    terms = sorted(set(re.findall(r"[a-z0-9]+", query.lower())))
    if not terms:
        raise ValueError("prf needs at least one indexable query term")
    if scores is None:
        scores = bm25_scores(docs, k1=k1, b=b, id_col=id_col, text_col=text_col)
    fb_ids = (
        scores.where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.round(F.sum("bm25_r"), 6).alias("_s"))
        .orderBy(F.col("_s").desc(), F.col("doc_id").asc())
        .limit(k_fb)
        .select("doc_id")
    )
    expansion = (
        scores.join(F.broadcast(fb_ids), "doc_id", "left_semi")
        .where(~F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.round(F.sum("bm25_r"), 6).alias("_w"))
        .orderBy(F.col("_w").desc(), F.col("term").asc())
        .limit(n_expand)
        .select("term", F.lit(float(beta)).alias("weight"))
    )
    qterms = None
    for t in terms:
        leg = expansion.sparkSession.createDataFrame(
            [(t, 1.0)], "term string, weight double"
        )
        qterms = leg if qterms is None else qterms.unionByName(leg)
    weighted = qterms.unionByName(expansion)
    rescored = (
        scores.join(F.broadcast(weighted), "term")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("bm25_r") * F.col("weight")), 6).alias("score_r"))
    )
    topk = rescored.orderBy(F.col("score_r").desc(), F.col("doc_id").asc()).limit(k)
    w_rank = Window.orderBy(F.col("score_r").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w_rank)).select(
        "doc_id", "score_r", "rank"
    )


def reciprocal_rank_fusion(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    score(d) = Σ over input rankings of 1/(k + rank(d)) — the
    training-free way to combine heterogeneous rankers (BM25, PageRank
    priority, freshness) that consistently beats each input. k=60 per
    the paper. Inputs are (id, rank) frames (rank 1-based; a doc absent
    from a list contributes nothing). One union + one partial-agg
    groupBy — shuffle ∝ Σ list lengths, which for top-k inputs is tiny.
    Returns (id, n_lists, rrf_r) rounded 6; ties broken downstream by id
    like every ranker here."""
    if not rankings:
        raise ValueError("rrf needs at least one ranking")
    if k < 1:
        raise ValueError("k must be >= 1")
    u = None
    for r in rankings:
        leg = r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias(
                "_c"
            ),
        )
        u = leg if u is None else u.unionByName(leg)
    return u.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_lists"),
        F.round(F.sum("_c"), 6).alias("rrf_r"),
    )


def comb_fusion(
    runs: list[DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score_r",
) -> DataFrame:
    """CombSUM / CombMNZ score fusion (Fox & Shaw, TREC-2 1994) — the
    SCORE-based companion to `reciprocal_rank_fusion`'s rank-based
    combination: each run's scores are min-max normalized to [0,1]
    (scores from BM25, QL, and a neural ranker live on incomparable
    scales; normalization is what makes the sum meaningful), then
    CombSUM(d) = Σ norm scores, CombMNZ(d) = CombSUM(d) × (number of
    runs returning d) — MNZ's multiplier rewards corroboration and is
    the variant that won TREC's fusion track. Returns (id, n_lists,
    combsum_r, combmnz_r) rounded 6.

    Physical shape: per run ONE 1-row (min, max) aggregate attached via
    the constant-key BroadcastHashJoin (join_scalar_frame — never a
    nested loop), then one union + one partial-agg groupBy; shuffle ∝
    Σ list lengths (tiny for top-k runs). A constant-score run (max =
    min) normalizes to 1.0 for every doc it returns — presence is its
    only signal, matching the CombMNZ intuition."""
    from . import join_scalar_frame

    if not runs:
        raise ValueError("comb_fusion needs at least one run")
    u = None
    for r in runs:
        leg = r.select(F.col(id_col), F.col(score_col).alias("_s"))
        mm = leg.agg(
            F.min("_s").alias("_mn"), F.max("_s").alias("_mx")
        )
        norm = join_scalar_frame(leg, mm).select(
            F.col(id_col),
            F.when(
                F.col("_mx") > F.col("_mn"),
                (F.col("_s") - F.col("_mn")) / (F.col("_mx") - F.col("_mn")),
            )
            .otherwise(F.lit(1.0))
            .alias("_n"),
        )
        u = norm if u is None else u.unionByName(norm)
    return u.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_lists"),
        F.round(F.sum("_n"), 6).alias("combsum_r"),
        F.round(F.sum("_n") * F.count(F.lit(1)), 6).alias("combmnz_r"),
    )


_VBYTE_TIERS = [128 ** i for i in range(1, 9)]  # 128^1 .. 128^8 = 2^56


def col_vbyte_len(v: Column) -> Column:
    """Varint (VByte) encoded length in bytes of a non-negative int64 —
    integer threshold CASE, not float log, so 128^k boundaries are exact
    on every engine. A 63-bit value needs at most ceil(63/7) = 9 bytes,
    so values >= 2^56 fall through to the 9-byte default."""
    expr = F.lit(9)
    for n_bytes in range(8, 0, -1):
        expr = F.when(v < F.lit(_VBYTE_TIERS[n_bytes - 1]), F.lit(n_bytes)).otherwise(
            expr
        )
    return expr


def postings_compression_stats(
    docs: DataFrame,
    bucket_bits: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-term inverted-list storage estimate under gap + VByte
    compression (Manning/IIR §5.3 — the d-gap encoding every production
    index uses): cost(list) = vbyte(d0 + 1) + Σ vbyte(d_i − d_{i−1})
    over the doc-id-sorted postings. Returns (term, df, raw_bytes,
    vbyte_bytes, ratio_r) with raw_bytes = 8·df (int64 ids) and ratio
    rounded to 6.

    Physical shape — the hot-term problem solved structurally: a naive
    `lag() OVER (PARTITION BY term ORDER BY doc_id)` puts a stopword's
    entire 10^10-row posting list in ONE window task. Instead gaps are
    computed two-level: (1) within (term, doc_id >> bucket_bits) buckets
    — every window task is bounded by the bucket width 2^bucket_bits
    regardless of df; (2) one more window per term over the BUCKET
    SUMMARY rows (min/max id per non-empty bucket — 2^44-doc corpus at
    bucket_bits=20 leaves ≤ 2^24 summary rows for the hottest possible
    term) supplies the cross-bucket boundary gaps and the first-posting
    cost. The two levels sum to exactly the sequential definition —
    asserted against the naive single-window form in tests and against
    the DuckDB lag restatement in the oracle.
    """
    if not 0 < bucket_bits < 63:
        raise ValueError("bucket_bits must be in (0, 63)")
    post = postings(docs, id_col, text_col).select(
        "term", "doc_id", F.shiftright("doc_id", bucket_bits).alias("bkt")
    )
    w_in = Window.partitionBy("term", "bkt").orderBy("doc_id")
    local = (
        post.withColumn("prev", F.lag("doc_id").over(w_in))
        .withColumn(
            "cost",
            F.when(F.col("prev").isNull(), F.lit(0)).otherwise(
                col_vbyte_len(F.col("doc_id") - F.col("prev"))
            ),
        )
        .groupBy("term", "bkt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cost").alias("local_bytes"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )
    w_b = Window.partitionBy("term").orderBy("bkt")
    bridged = local.withColumn(
        "prev_max", F.lag("max_id").over(w_b)
    ).withColumn(
        "bridge",
        F.when(
            F.col("prev_max").isNull(), col_vbyte_len(F.col("min_id") + 1)
        ).otherwise(col_vbyte_len(F.col("min_id") - F.col("prev_max"))),
    )
    return bridged.groupBy("term").agg(
        F.sum("n").alias("df"),
        (F.sum("n") * 8).alias("raw_bytes"),
        (F.sum("local_bytes") + F.sum("bridge")).alias("vbyte_bytes"),
        F.round(
            (F.sum("local_bytes") + F.sum("bridge"))
            / (F.sum("n") * 8.0),
            6,
        ).alias("ratio_r"),
    )


def col_floor_log2(q: Column) -> Column:
    """floor(log2(q)) for a positive int64, integer-exact on every engine:
    the bit length of q's binary representation minus 1. `F.log2` is libm
    float — at q = 2^k a last-ulp undershoot would floor to k−1 and flip
    a compressed-size estimate by a whole bit per posting; `conv(q,10,2)`
    string length cannot. DuckDB's `bin()` restates it exactly."""
    return (F.length(F.conv(q.cast("string"), 10, 2)) - 1).cast("int")


def elias_fano_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-term inverted-list storage estimate under Elias–Fano encoding
    (Vigna, \"Quasi-succinct indices\", WSDM'13 — the monotone-sequence
    code behind partitioned-EF postings in Lucene/MG4J): a sorted list of
    n doc ids drawn from a per-list universe U = max_id + 1 splits each id
    into l = max(0, floor(log2(U/n))) low bits stored verbatim (n·l bits)
    and high bits stored unary (n ones + (U >> l) zeros ≤ 2n), for
    ef_bits = n·l + n + (U >> l) — within half a bit per element of the
    information-theoretic minimum, with O(1) random access (the property
    that makes EF postings skippable without a separate skip list).

    Returns (term, df, raw_bytes, ef_bits, ef_bytes, ratio_r) with
    raw_bytes = 8·df (int64 ids), ef_bytes = ceil(ef_bits / 8) and
    ratio_r = ef_bytes / raw_bytes rounded to 6. Complements the d-gap
    VByte estimate (`postings_compression_stats`) and the dictionary
    front-coding estimate (`dictionary_frontcoding_stats`) as the third
    leg of index sizing.

    Physical shape: EF's size depends ONLY on (n, max_id) — no gap
    sequence, no windows — so the whole estimate is the postings census
    plus ONE partial-agg groupBy(term) computing count + max. A stopword
    with a 10^10-row posting list costs the same partial-agg max as any
    other term; there is no hot-key window anywhere. floor(log2) runs
    through `col_floor_log2` (integer bit-length, never libm) so power-
    of-two universes land exactly on every engine.
    """
    lists = postings(docs, id_col, text_col).groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.max("doc_id").alias("max_id")
    )
    # l = max(0, floor(log2(U div n))) — `div` is int64 division (float
    # `/` could round k·n−1 up to k·n near 2^53 and overshoot l by one
    # at a power-of-two boundary); U ≥ n always (n distinct ids in
    # [0, U)), so the quotient is ≥ 1 and the bit-length form is defined.
    # floor(log2(x)) = floor(log2(floor(x))) for x ≥ 1 since powers of
    # two are integers, so integer division loses nothing.
    lists = lists.withColumn(
        "_l",
        F.greatest(
            F.lit(0), col_floor_log2(F.expr("(max_id + 1) div df"))
        ),
    )
    lists = lists.withColumn(
        "_ef_bits",
        (
            F.col("df") * F.col("_l")
            + F.col("df")
            + F.expr("shiftright(max_id + 1, _l)")
        ).cast("long"),
    ).withColumn("_ef_bytes", F.expr("(_ef_bits + 7) div 8"))
    return lists.select(
        "term",
        "df",
        (F.col("df") * 8).alias("raw_bytes"),
        F.col("_ef_bits").alias("ef_bits"),
        F.col("_ef_bytes").alias("ef_bytes"),
        F.round(F.col("_ef_bytes") / (F.col("df") * 8.0), 6).alias("ratio_r"),
    )


def bm25_search_diversified(
    docs: DataFrame,
    query: str,
    k: int = 10,
    per_host: int = 2,
    host_col: str = "host",
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 32,
) -> DataFrame:
    """Host-collapsed top-k search — the SERP diversity rule every web
    engine applies (at most ``per_host`` results per site, a.k.a. host
    crowding / site collapsing): rank all matches by summed BM25, keep
    each host's best ``per_host``, then take the global top ``k``.

    Physical shape: the per-host cap reuses the two-phase salted top-k
    discipline (``curation.per_source_quota`` / the politeness window) —
    phase 1 bounds every (host, salt) window task, phase 2 ranks the
    ≤ per_host·salt survivors per host, so one mega-host matching 10^9
    docs never serializes a window. The global top-k is
    orderBy().limit() → TakeOrderedAndProject; the final rank window
    runs over ≤k rows. Returns (doc_id, host, score_r, host_rank, rank),
    deterministic on (score_r DESC, doc_id ASC) everywhere.
    """
    if k < 1 or per_host < 1:
        raise ValueError("k >= 1 and per_host >= 1")
    scores = bm25_query_scores(
        docs, query, k1=k1, b=b, id_col=id_col, text_col=text_col
    )
    hosts = docs.select(
        F.col(id_col).alias("doc_id"), F.col(host_col).alias("host")
    )
    scored = scores.join(hosts, "doc_id")
    order = [F.col("score_r").desc(), F.col("doc_id").asc()]
    salted = scored.withColumn(
        "_dsalt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(salt))
    )
    w1 = Window.partitionBy("host", "_dsalt").orderBy(*order)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= per_host)
        .drop("_r1", "_dsalt")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    capped = (
        survivors.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= per_host)
    )
    topk = capped.orderBy(*order).limit(k)
    w3 = Window.orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w3)).select(
        "doc_id", "host", "score_r", "host_rank", "rank"
    )


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The positional index fact table: (term, doc_id, pos), pos = the
    term's 0-based ordinal in the token stream. ~1 row per corpus token —
    the classic space-for-phrase-queries trade (Manning/IIR §2.4.2's
    positional index); ``postings`` stays the compact (term, doc_id, tf)
    table for scoring. One projection + posexplode, no shuffle until a
    consumer aggregates."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(col_index_tokens(text_col)).alias("pos", "term"),
    ).select("term", "doc_id", "pos")


def boolean_search(
    docs: DataFrame,
    must: list[str] | None = None,
    should: list[str] | None = None,
    must_not: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boolean retrieval (Manning IIR ch.1 — the AND/OR/NOT model every
    ranked engine still exposes as filter clauses): docs containing ALL
    ``must`` terms, at least one ``should`` term (when any are given),
    and no ``must_not`` term. Terms are single tokens under the index
    tokenizer; at least one positive clause is required (pure negation
    over a 100 TB corpus is a full scan by definition — refused, not
    silently executed).

    Physical shape: one distinct (doc, term) census filtered to the
    clause terms before any shuffle; MUST is a partial-agg count
    equality (never a k-way self-join), SHOULD a semi-join, MUST_NOT an
    anti-join — all on doc_id. Returns (doc_id, n_must, n_should),
    deterministic."""
    must = sorted(set(must or []))
    should = sorted(set(should or []))
    must_not = sorted(set(must_not or []))
    if not must and not should:
        raise ValueError("boolean_search needs at least one must/should term")
    if set(must) & set(must_not):
        raise ValueError("a term cannot be both must and must_not")
    every = sorted(set(must) | set(should) | set(must_not))
    seen = (
        positional_postings(docs, id_col, text_col)
        .where(F.col("term").isin(every))
        .select("doc_id", "term")
        .distinct()
    )
    flags = seen.groupBy("doc_id").agg(
        F.sum(F.when(F.col("term").isin(must), 1).otherwise(0))
        .cast("int")
        .alias("n_must"),
        F.sum(F.when(F.col("term").isin(should), 1).otherwise(0))
        .cast("int")
        .alias("n_should"),
        F.sum(F.when(F.col("term").isin(must_not), 1).otherwise(0)).alias("_neg"),
    )
    out = flags.where(F.col("_neg") == 0)
    if must:
        out = out.where(F.col("n_must") == len(must))
    if should:
        out = out.where(F.col("n_should") >= 1)
    return out.select("doc_id", "n_must", "n_should")


def more_like_this(
    docs: DataFrame,
    source_doc_id,
    k: int = 10,
    max_df_frac: float = 0.25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Related-document retrieval by tf-idf cosine against one source doc
    (the Lucene MoreLikeThis discipline): the source's terms become the
    query, STOP-TERM-SCREENED by document frequency (terms in more than
    ``max_df_frac`` of docs carry no signal AND would join against most
    of the corpus — the screen is the scale guard, not a tuning knob).

    weight(d,t) = tf · ln(1 + N/df); cosine over the full weight vectors
    of the source and each candidate sharing ≥1 surviving term. Shuffle
    ∝ postings of the source's surviving terms; per-doc norms are one
    partial agg over the full postings (needed for a true cosine);
    the source row is ≤ |source terms| and broadcasts. Returns top-k
    (doc_id, cosine_r, rank), the source itself excluded."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if not (0 < max_df_frac <= 1):
        raise ValueError("max_df_frac must be in (0, 1]")
    from . import join_scalar_frame

    post = postings(docs, id_col, text_col)
    n_docs = docs.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = document_frequency(post)
    w = join_scalar_frame(post.join(dfreq, "term"), n_docs).select(
        "doc_id",
        "term",
        "df",
        "n_docs",
        (
            F.col("tf")
            * F.log(F.lit(1.0) + F.col("n_docs") / F.col("df"))
        ).alias("w"),
    )
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    src = w.where(
        (F.col("doc_id") == source_doc_id)
        & (F.col("df") <= F.col("n_docs") * max_df_frac)
    ).select(F.col("term"), F.col("w").alias("w_src"))
    cand = (
        w.join(F.broadcast(src), "term")
        .where(F.col("doc_id") != source_doc_id)
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("w_src")).alias("dot"))
    )
    src_norm = norms.where(F.col("doc_id") == source_doc_id).select(
        F.col("norm").alias("src_norm")
    )
    scored = join_scalar_frame(cand.join(norms, "doc_id"), src_norm).select(
        "doc_id",
        F.round(
            F.col("dot") / (F.col("norm") * F.col("src_norm")), 6
        ).alias("cosine_r"),
    )
    topk = scored.orderBy(F.col("cosine_r").desc(), F.col("doc_id").asc()).limit(k)
    w_rank = Window.orderBy(F.col("cosine_r").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w_rank)).select(
        "doc_id", "cosine_r", "rank"
    )


def term_proximity(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise term-proximity signal (the span/proximity re-ranker of
    Büttcher, Clarke & Lushman SIGIR 2006, reduced to its deterministic
    core): for every unordered pair of distinct query terms present in a
    doc, the minimum absolute position distance, accumulated as
    prox = Σ_pairs 1/min_dist — terms adjacent somewhere score a full
    point per pair, terms far apart almost nothing. Re-ranks the BM25
    top-k (join on doc_id) rather than replacing it; docs containing
    fewer than 2 distinct query terms get prox 0 and null min_dist.

    Scale shape: positional postings filtered to the query IN-list
    BEFORE any shuffle (postings ∝ query terms only), one doc_id-keyed
    self-join (per-doc-local position pairing), two partial aggs. Output
    (doc_id, n_terms_present, min_pair_dist, prox_r)."""
    terms = tokenize_phrase(query)
    uniq = sorted(set(terms))
    if len(uniq) < 1:
        raise ValueError("proximity needs at least one indexable query term")
    pos = positional_postings(docs, id_col, text_col).where(
        F.col("term").isin(uniq)
    )
    present = pos.groupBy("doc_id").agg(
        F.countDistinct("term").cast("int").alias("n_terms_present")
    )
    a = pos.select("doc_id", F.col("term").alias("ta"), F.col("pos").alias("pa"))
    b = pos.select("doc_id", F.col("term").alias("tb"), F.col("pos").alias("pb"))
    pair_min = (
        a.join(b, "doc_id")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("doc_id", "ta", "tb")
        .agg(F.min(F.abs(F.col("pa") - F.col("pb"))).alias("md"))
    )
    per_doc = pair_min.groupBy("doc_id").agg(
        F.min("md").cast("int").alias("min_pair_dist"),
        F.round(F.sum(F.lit(1.0) / F.col("md")), 6).alias("prox_r"),
    )
    return present.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_terms_present",
        "min_pair_dist",
        F.coalesce(F.col("prox_r"), F.lit(0.0)).alias("prox_r"),
    )


def tokenize_phrase(phrase: str) -> list[str]:
    """Driver-side twin of ``col_index_tokens`` for query strings."""
    import re

    return re.findall(r"[a-z0-9]+", phrase.lower())


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase query over the positional index: docs where the
    phrase's terms occur contiguously in order, with the match count.
    Returns (doc_id, matches), matches ≥ 1.

    Physical shape: the positional postings are filtered to the phrase's
    terms FIRST — Catalyst places the IN-list directly above the
    tokenizing Generate (it cannot reach the file scan because terms
    derive from text; over a MATERIALIZED positional-postings table the
    same predicate does push into the parquet scan), so only query-term
    rows ever shuffle, and the rarer legs broadcast. Each term i is
    anchored at (doc_id, pos − i) and the k terms meet in k−1 equi-joins
    on that anchor key — the same bytes a hand-built positional B-tree
    lookup would touch. A phrase of one term degenerates to its tf."""
    terms = tokenize_phrase(phrase)
    if not terms:
        raise ValueError("phrase contains no index terms")
    pos = positional_postings(docs, id_col, text_col).where(
        F.col("term").isin(*set(terms))
    )
    anchored = None
    for i, t in enumerate(terms):
        leg = pos.where(F.col("term") == t).select(
            "doc_id", (F.col("pos") - i).alias("anchor")
        )
        anchored = leg if anchored is None else anchored.join(
            leg, ["doc_id", "anchor"], "inner"
        )
    return anchored.groupBy("doc_id").agg(F.count(F.lit(1)).alias("matches"))


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """Prospective search (the Elasticsearch-percolator / Google-Alerts
    shape, inverted from retrieval): a table of STANDING queries is
    matched against each incoming document batch — every crawl tick's
    fresh pages flow through once and alert on every conjunctive
    (all-terms-present) query they satisfy. Returns (doc_id, query_id,
    n_terms) — one row per (document, matched query).

    Physical shape, 100 TB first: queries are tokenized to DISTINCT
    (term, query_id, n_terms) legs — a registry of thousands of rows,
    broadcast-sized next to the doc batch. Docs reduce to distinct
    (doc_id, term) pairs (set semantics — term multiplicity cannot
    double-count a conjunction), the term-keyed join broadcasts the
    query legs under AQE, and the conjunction check is one partial-agg
    census: count matched distinct terms per (doc, query) == the
    query's term count. Shuffle ∝ (doc, query-term) matches only; docs
    whose terms touch no standing query never leave the map side. A
    disjunctive (any-term) percolator is the same plan without the
    final equality filter."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.array_distinct(col_index_tokens(query_col)).alias("_qt"),
    ).where(F.size("_qt") > 0)
    q_legs = q.select(
        "query_id", F.size("_qt").alias("q_n"), F.explode("_qt").alias("term")
    )
    d_terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(col_index_tokens(text_col))).alias("term"),
    )
    return (
        d_terms.join(q_legs, "term")
        .groupBy("doc_id", "query_id", "q_n")
        .agg(F.count(F.lit(1)).alias("n_terms"))
        .where(F.col("n_terms") == F.col("q_n"))
        .select("doc_id", "query_id", "n_terms")
    )


def ql_dirichlet_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    mu: float = 2000.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Query-likelihood ranking with Dirichlet smoothing (Zhai &
    Lafferty, SIGIR 2001) — the language-modeling ranker next to BM25
    (the two ends of the classic probabilistic-IR spectrum; having both
    lets rrf/fusion combine genuinely different rankers):

        score(d) = Σ_t log( (tf(t,d) + μ·P(t|C)) / (dl(d) + μ) )

    over the query's terms, P(t|C) = collection frequency / total
    tokens. Smoothing means a doc missing a term is penalized, not
    zeroed — but a term absent from the whole COLLECTION has P(t|C)=0
    and would -inf every doc, so unknown terms are dropped (the standard
    treatment; a query whose EVERY term is collection-unknown yields an
    empty frame — deciding that eagerly would cost a job, so it stays
    lazy). Matching docs only (docs matching no query term are absent,
    like bm25_search).

    Same physical shape as bm25_scores: postings + dl + one scalar
    hash-join; top-k via TakeOrderedAndProject. Returns
    (doc_id, score_r, rank); scores are negative log-likelihoods —
    closer to 0 is better."""
    terms = sorted(set(re.findall(r"[a-z0-9]+", query.lower())))
    if not terms:
        raise ValueError("ql needs at least one indexable query term")
    if mu <= 0:
        raise ValueError("mu must be > 0")
    post = postings(docs, id_col, text_col)
    dl = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    coll = (
        post.where(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.sum("tf").alias("cf"))
    )
    tot = post.groupBy().agg(
        F.coalesce(F.sum("tf"), F.lit(0)).cast("double").alias("ctot")
    )
    known = join_scalar_frame(coll, tot).select(
        "term", (F.col("cf") / F.col("ctot")).alias("ptc")
    )
    # matching docs: any known query term present; score needs EVERY
    # known term's tf (0 when absent) → right join term-grid onto the
    # doc's postings via the (doc × known-term) frame built from dl
    cand = (
        post.where(F.col("term").isin(terms))
        .select("doc_id")
        .distinct()
        .join(dl, "doc_id")
    )
    # doc × known-term grid via a non-foldable constant equi-key (the
    # join_scalar_frame trick, k-row side) — BroadcastHashJoin, never NL
    grid = cand.withColumn("_k", F.pmod(F.xxhash64("doc_id"), F.lit(1))).join(
        F.broadcast(
            known.withColumn("_k", F.pmod(F.xxhash64("term"), F.lit(1)))
        ),
        "_k",
    ).drop("_k")
    tf = (
        post.where(F.col("term").isin(terms))
        .select("doc_id", "term", "tf")
    )
    scored = (
        grid.join(tf, ["doc_id", "term"], "left")
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("tf"), F.lit(0)) + F.lit(mu) * F.col("ptc"))
                / (F.col("dl") + F.lit(mu))
            ).alias("_s"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score_r"))
    )
    topk = scored.orderBy(F.col("score_r").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("score_r").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score_r", "rank"
    )


def prune_postings_static(
    scores: DataFrame,
    lam: int = 32,
    salt: int = 8,
) -> DataFrame:
    """Static index pruning (Carmel et al., SIGIR 2001): keep only each
    term's top-λ postings by impact (bm25_r, ties → smaller doc_id) —
    the serving-index diet that trades a bounded quality loss for a
    hard per-term size cap (stop-word postings stop being corpus-sized).
    Returns the surviving (doc_id, term, tf, bm25_r) rows.

    Hot-term safe: the naive per-term window is corpus-sized for a stop
    word, so this uses the repo's two-phase salted top-k — phase 1 ranks
    within (term, doc-hash salt) so every window task is bounded, phase
    2 ranks the ≤ salt·λ survivors per term. Identical results to the
    single-window form (pytest-pinned), never its skew."""
    if lam < 1 or salt < 1:
        raise ValueError("lam and salt must be >= 1")
    salted = scores.withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt)))
    w1 = Window.partitionBy("term", "_salt").orderBy(
        F.col("bm25_r").desc(), F.col("doc_id").asc()
    )
    phase1 = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= lam)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy("term").orderBy(
        F.col("bm25_r").desc(), F.col("doc_id").asc()
    )
    return (
        phase1.withColumn("_r2", F.row_number().over(w2))
        .where(F.col("_r2") <= lam)
        .drop("_r2")
    )


def query_clarity(
    scores: DataFrame,
    post: DataFrame,
    query: str,
    k_fb: int = 10,
) -> DataFrame:
    """Query clarity score (Cronen-Townsend, Zhou & Croft, SIGIR 2002):
    KL divergence between the query's feedback language model (MLE over
    the top-``k_fb`` docs' token stream) and the collection model —
    HIGH clarity = the query's result language is focused (an easy,
    well-specified query); near zero = results look like the whole
    corpus (the query-difficulty predictor a serving tier uses to decide
    when to expand/route/escalate).

        clarity = Σ_t P(t|q)·log2(P(t|q) / P(t|C))

    over the feedback docs' terms; P(t|C) = collection frequency / total
    tokens. Deterministic: feedback set = the rounded-BM25 top-k.
    Inputs are the impact table and the postings (both standing); one
    semi-join + two censuses. Returns one row
    (n_fb_docs, n_terms, clarity_r)."""
    terms = sorted(set(re.findall(r"[a-z0-9]+", query.lower())))
    if not terms:
        raise ValueError("clarity needs at least one indexable query term")
    if k_fb < 1:
        raise ValueError("k_fb must be >= 1")
    fb_ids = (
        scores.where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.round(F.sum("bm25_r"), 6).alias("_s"))
        .orderBy(F.col("_s").desc(), F.col("doc_id").asc())
        .limit(k_fb)
        .select("doc_id")
    )
    fb = post.join(F.broadcast(fb_ids), "doc_id", "left_semi")
    fb_terms = fb.groupBy("term").agg(F.sum("tf").alias("qtf"))
    coll = post.groupBy("term").agg(F.sum("tf").alias("cf"))
    totals = join_scalar_frame(
        fb_terms.groupBy().agg(F.sum("qtf").cast("double").alias("qtot")),
        post.groupBy().agg(F.sum("tf").cast("double").alias("ctot")),
    )
    j = join_scalar_frame(fb_terms.join(coll, "term"), totals)
    pq = F.col("qtf") / F.col("qtot")
    pc = F.col("cf") / F.col("ctot")
    contrib = pq * F.log2(pq / pc)
    n_docs = fb_ids.count()
    return j.agg(
        F.lit(int(n_docs)).alias("n_fb_docs"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.round(F.sum(contrib), 6).alias("clarity_r"),
    )


def shard_term_stats(
    docs: DataFrame,
    shard_col: str = "shard",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(shard, term) document frequency + per-shard token counts —
    the resource-description table federated search keeps per index
    shard (one row per shard×term, refreshed by the same incremental
    discipline as the postings). Returns (shard, term, df, cw) where cw
    is the shard's total token count."""
    post = docs.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.explode(col_index_tokens(text_col)).alias("term"),
    )
    df_t = (
        post.groupBy("shard", "term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("shard", "term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("_toks"))
    )
    cw = df_t.groupBy("shard").agg(F.sum("_toks").alias("cw"))
    return df_t.join(cw, "shard").select("shard", "term", "df", "cw")


def cori_shard_scores(
    stats: DataFrame,
    query: str,
    b: float = 0.4,
) -> DataFrame:
    """CORI resource selection (Callan, Lu & Croft, SIGIR 1995): rank
    index SHARDS by how likely they are to hold a query's results, so a
    federated top-k touches a few shards instead of all of them — the
    query-side complement of rendezvous document routing.

        T = df / (df + 50 + 150·cw_s/avg_cw)
        I = log((|S| + 0.5) / cf_t) / log(|S| + 1)
        belief(t,s) = b + (1−b)·T·I;   score(s) = mean over query terms

    (the paper's constants; cf_t = shards containing t, absent terms
    contribute belief b). Input is the ``shard_term_stats`` table — the
    tiny resource description, never the postings. One filtered census +
    two scalar hash-joins. Returns (shard, score_r, rank)."""
    terms = sorted(set(re.findall(r"[a-z0-9]+", query.lower())))
    if not terms:
        raise ValueError("cori needs at least one indexable query term")
    if not (0.0 <= b < 1.0):
        raise ValueError("b must be in [0, 1)")
    shards = stats.select("shard", "cw").distinct()
    consts = shards.groupBy().agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.avg("cw").alias("avg_cw"),
    )
    cf = (
        stats.where(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cf"))
    )
    q = stats.where(F.col("term").isin(terms)).join(cf, "term")
    scored = join_scalar_frame(q, consts).select(
        "shard",
        "term",
        (
            F.lit(b)
            + F.lit(1.0 - b)
            * (
                F.col("df")
                / (F.col("df") + 50.0 + 150.0 * F.col("cw") / F.col("avg_cw"))
            )
            * (
                F.log((F.col("n_shards") + 0.5) / F.col("cf"))
                / F.log(F.col("n_shards") + 1.0)
            )
        ).alias("belief"),
    )
    # absent (shard, term) pairs contribute the default belief b: mean =
    # (Σ present beliefs + b·n_absent) / n_terms
    per_shard = (
        shards.select("shard")
        .join(scored.groupBy("shard").agg(
            F.sum("belief").alias("_s"), F.count(F.lit(1)).alias("_n")
        ), "shard", "left")
        .select(
            "shard",
            F.round(
                (
                    F.coalesce(F.col("_s"), F.lit(0.0))
                    + F.lit(float(b))
                    * (F.lit(len(terms)) - F.coalesce(F.col("_n"), F.lit(0)))
                )
                / F.lit(float(len(terms))),
                6,
            ).alias("score_r"),
        )
    )
    w = Window.orderBy(F.col("score_r").desc(), F.col("shard").asc())
    return per_shard.withColumn("rank", F.row_number().over(w)).select(
        "shard", "score_r", "rank"
    )


def dictionary_frontcoding_stats(
    docs: DataFrame,
    bucket_chars: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Term-dictionary front-coding estimate (Manning IIR §5.2 — the
    dictionary half of index sizing, next to §5.3's postings vbyte): in
    a sorted dictionary, consecutive terms share prefixes; front coding
    stores (shared-prefix length, suffix). Two-level like
    ``postings_compression_stats``: terms sort WITHIN first-
    ``bucket_chars`` buckets (each bucket's first term stored in full —
    the bucketed-dictionary layout real indexes use for random access),
    so no global vocabulary sort and every window task is bucket-
    bounded. raw = Σ (len+1) per term (NUL-terminated strawman); coded
    replaces each shared prefix with a 1-byte length. Returns one row:
    (n_terms, raw_bytes, coded_bytes, saved_bytes, ratio_r)."""
    if bucket_chars < 1:
        raise ValueError("bucket_chars must be >= 1")
    vocab = (
        positional_postings(docs, id_col, text_col)
        .select("term")
        .distinct()
        .select("term", F.substring("term", 1, bucket_chars).alias("_b"))
    )
    w = Window.partitionBy("_b").orderBy("term")
    # materialize the lag first (a window result can't appear inside a
    # higher-order-function lambda), then count common-prefix positions:
    # substring equality at i implies equality at every j < i, so the
    # count IS the common-prefix length
    lagged = vocab.select(
        "term", F.coalesce(F.lag("term").over(w), F.lit("")).alias("_prev")
    )
    minlen = F.least(F.length("term"), F.length("_prev"))
    cpl = F.when(minlen <= 0, F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.sequence(F.lit(1), minlen),  # guarded: never sequence(1,0)
                lambda i: F.substring(F.col("term"), F.lit(1), i)
                == F.substring(F.col("_prev"), F.lit(1), i),
            )
        )
    )
    per_term = lagged.select(
        F.length("term").alias("tl"),
        F.when(F.col("_prev") == "", F.lit(0)).otherwise(cpl).alias("cpl"),
    )
    return per_term.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum(F.col("tl") + 1).cast("long").alias("raw_bytes"),
        F.sum(F.col("tl") - F.col("cpl") + 2).cast("long").alias("coded_bytes"),
        F.sum(F.col("cpl") - 1).cast("long").alias("saved_bytes"),
        F.round(
            F.sum(F.col("tl") - F.col("cpl") + 2)
            / F.when(F.sum(F.col("tl") + 1) > 0, F.sum(F.col("tl") + 1)),
            6,
        ).alias("ratio_r"),
    )


def vocab_kgrams(vocab: DataFrame, k: int = 2) -> Column:
    """Distinct character k-grams of the ``term`` column (terms shorter
    than k contribute themselves) — the k-gram index key of IIR §3.3.4."""
    return F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.length("term") - (k - 1), F.lit(1))
            ),
            lambda i: F.substring("term", i, k),
        )
    )


def _query_kgrams(term: str, k: int = 2) -> list[str]:
    """Driver-side twin of ``vocab_kgrams`` for the query string."""
    grams = [term[i : i + k] for i in range(max(len(term) - (k - 1), 1))]
    return sorted(set(grams))


def term_suggestions(
    docs: DataFrame,
    query_term: str,
    k: int = 2,
    max_dist: int = 2,
    min_gram_overlap: int = 1,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Isolated-term spelling correction ("did you mean") — Manning/IIR
    §3.3: k-gram index candidate generation, exact edit-distance verify,
    collection-frequency ranking. Returns the top-``n`` vocabulary terms
    within ``max_dist`` edits of ``query_term`` as (term, df, dist,
    rank), ranked by (dist ASC, df DESC, term ASC) so an exact vocab hit
    always ranks first and ties are engine-deterministic.

    Physical shape, 100 TB first: the k-gram index is built over the
    VOCABULARY (distinct terms + document frequency — millions of rows
    at web scale, not the corpus token stream), one array_distinct
    transform + explode. The query's grams are an IN-list literal, so
    only gram buckets the query touches ever shuffle; bucket size is
    bounded by vocabulary size, never corpus size (a hot bigram like
    'th' costs a vocab-bounded partial-agg, not a corpus scan).
    ``levenshtein`` — quadratic per pair — runs only on candidates that
    already share ``min_gram_overlap`` distinct grams with the query.
    """
    q = query_term.lower().strip()
    if not re.fullmatch(r"[a-z0-9]+", q or ""):
        raise ValueError("query_term must be one indexable term")
    if max_dist < 0 or n < 1 or min_gram_overlap < 1:
        raise ValueError("max_dist >= 0, n >= 1, min_gram_overlap >= 1")
    vocab = document_frequency(postings(docs, id_col, text_col))
    qgrams = _query_kgrams(q, k)
    cands = (
        vocab.select("term", "df", F.explode(vocab_kgrams(vocab, k)).alias("g"))
        .where(F.col("g").isin(qgrams))
        .groupBy("term", "df")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_gram_overlap)
    )
    verified = cands.select(
        "term", "df", F.levenshtein(F.lit(q), F.col("term")).alias("dist")
    ).where(F.col("dist") <= max_dist)
    w = Window.orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("term").asc()
    )
    topn = verified.orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("term").asc()
    ).limit(n)
    return topn.withColumn("rank", F.row_number().over(w)).select(
        "term", "df", "dist", "rank"
    )


def query_snippets(
    docs: DataFrame,
    query: str,
    window: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Query-biased snippets (dynamic summaries, Manning/IIR §8.7; the
    KWIC display every SERP shows under a hit) — for each document that
    matches any query term, the ``window``-token span that best covers
    the query, reconstructed as normalized text.

    Deterministic spec (engine-portable, no scoring heuristics):

    - candidate windows start AT a query-term hit and cover token
      positions [start, start+window);
    - the best window maximizes (#distinct query terms inside, then
      earliest start) — ties cannot survive the (n_terms DESC, start
      ASC) order;
    - the snippet is the window's tokens under the index tokenizer
      (lowercased alphanumeric runs) joined by single spaces — a
      normalized summary, NOT original bytes (the positional index does
      not store raw offsets; storing (start_byte, end_byte) per token
      would be the production extension).

    Physical shape, 100 TB first: tokens are filtered to query terms
    BEFORE any shuffle, so the candidate/coverage self-join is bounded
    by query-term hits per doc (window-sized band predicate over one
    doc_id-keyed equi-join — never a cross product). Snippet
    reconstruction re-joins the full token stream once, keyed on
    doc_id; only matching docs survive the inner join, and with the
    best-window side under the AQE broadcast threshold the token leg
    never shuffles at all. Returns (doc_id, start, n_terms, snippet).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    qterms = sorted(set(tokenize_phrase(query)))
    if not qterms:
        raise ValueError("query contains no index terms")
    toks = positional_postings(docs, id_col, text_col)
    hits = toks.where(F.col("term").isin(qterms))
    starts = hits.select("doc_id", F.col("pos").alias("start")).distinct()
    cover = (
        starts.join(hits, "doc_id")
        .where(
            (F.col("pos") >= F.col("start"))
            & (F.col("pos") < F.col("start") + window)
        )
        .groupBy("doc_id", "start")
        .agg(F.countDistinct("term").alias("n_terms"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("n_terms").desc(), F.col("start").asc()
    )
    best = (
        cover.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .drop("rk")
    )
    return (
        toks.join(best, "doc_id")
        .where(
            (F.col("pos") >= F.col("start"))
            & (F.col("pos") < F.col("start") + window)
        )
        .groupBy("doc_id", "start", "n_terms")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "term"))),
                    lambda x: x["term"],
                ),
                " ",
            ).alias("snippet")
        )
        .select("doc_id", "start", "n_terms", "snippet")
    )


def retrieval_eval(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Offline retrieval-quality evaluation (the TREC discipline) for the
    search stack: given ranked ``results`` (query, doc, rank) and graded
    judgments ``qrels`` (query, doc, rel>0 ⇒ relevant), emit per-query
    precision@k, recall@k, reciprocal rank@k, and nDCG@k with the
    exponential gain (2^rel − 1)/log2(rank+1) (Järvelin & Kekäläinen
    2002). Queries with no judged-relevant docs get NULL recall/nDCG and
    rr 0 (TREC omits them from macro averages —
    :func:`retrieval_eval_summary` does exactly that); judged queries
    missing from ``results`` still emit a row (full outer on the query
    set) so silent query drops read as 0, never as absence.

    Deterministic: ideal ranking ties broken by doc id.

    Scale shape (100 TB): never touches the corpus — results are
    pre-filtered to rank ≤ k so every shuffle is ∝ k·|queries| + |qrels|:
    one (query, doc) equi-join for hits, one window keyed on the query for
    the ideal DCG (bounded by judgments per query), partial-agg groupBys
    for the rest. Macro summary is a second partial-agg over |queries|
    rows."""
    res = results.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).alias("_rank"),
    ).filter(F.col("_rank") <= k)
    rels = qrels.filter(F.col(rel_col) > 0).select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rel_col).alias("_rel"),
    )
    gain = F.pow(F.lit(2.0), F.col("_rel")) - F.lit(1.0)

    hits = res.join(rels, ["_q", "_d"])
    hit_agg = hits.groupBy("_q").agg(
        F.count(F.lit(1)).cast("int").alias("n_rel_ret"),
        F.sum(gain / F.log2(F.col("_rank") + F.lit(1.0))).alias("dcg"),
        F.min("_rank").alias("first_rel_rank"),
    )
    iw = Window.partitionBy("_q").orderBy(F.desc("_rel"), F.asc("_d"))
    ideal = (
        rels.withColumn("_irn", F.row_number().over(iw))
        .filter(F.col("_irn") <= k)
        .groupBy("_q")
        .agg(F.sum(gain / F.log2(F.col("_irn") + F.lit(1.0))).alias("idcg"))
    )
    n_ret = res.groupBy("_q").agg(F.count(F.lit(1)).cast("int").alias("n_retrieved"))
    n_rel = rels.groupBy("_q").agg(F.count(F.lit(1)).cast("int").alias("n_rel"))

    per_q = (
        n_ret.join(n_rel, "_q", "full")
        .join(hit_agg, "_q", "left")
        .join(ideal, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            F.coalesce("n_retrieved", F.lit(0)).alias("n_retrieved"),
            F.coalesce("n_rel", F.lit(0)).alias("n_rel"),
            F.coalesce("n_rel_ret", F.lit(0)).alias("n_rel_ret"),
            (F.coalesce("n_rel_ret", F.lit(0)) / F.lit(float(k))).alias("precision_at_k"),
            F.when(
                F.coalesce("n_rel", F.lit(0)) > 0,
                F.coalesce("n_rel_ret", F.lit(0)) / F.col("n_rel"),
            ).alias("recall_at_k"),
            F.coalesce(F.lit(1.0) / F.col("first_rel_rank"), F.lit(0.0)).alias("rr_at_k"),
            F.when(
                F.coalesce("idcg", F.lit(0.0)) > 0,
                F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"),
            ).alias("ndcg_at_k"),
        )
    )
    return per_q


def retrieval_eval_summary(per_query: DataFrame, query_col: str = "query_id") -> DataFrame:
    """Macro averages over JUDGED queries (n_rel > 0 — the TREC
    convention; unjudged queries contribute nothing rather than dragging
    averages to 0). One partial-agg row: (n_queries, n_judged, mean_p,
    mean_recall, mrr, mean_ndcg)."""
    judged = F.col("n_rel") > 0
    return per_query.agg(
        F.count(F.lit(1)).cast("int").alias("n_queries"),
        F.sum(judged.cast("int")).cast("int").alias("n_judged"),
        F.avg(F.when(judged, F.col("precision_at_k"))).alias("mean_precision"),
        F.avg(F.when(judged, F.col("recall_at_k"))).alias("mean_recall"),
        F.avg(F.when(judged, F.col("rr_at_k"))).alias("mrr"),
        F.avg(F.when(judged, F.col("ndcg_at_k"))).alias("mean_ndcg"),
    )


def ranking_agreement(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score_r",
) -> DataFrame:
    """Agreement between two rankers over the same candidates — Spearman
    ρ (tie-averaged ranks) and Kendall τ-b (tie-corrected) in one row
    (n, spearman_r, kendall_r): the ranker-comparison report an IR
    experiment logs next to `retrieval_eval` (does MaxP actually
    reorder? did the impact-pruned index change the ranking or just the
    latency?). Agreement is measured over the id-intersection of the
    two score tables; higher score = better rank in both.

    Intended for RANKED LISTS (top-k output, k ≤ 10^3-10^4), not whole
    corpora: τ-b is pairwise by definition — the self-join materializes
    n(n−1)/2 pairs, exact and fine at list size, quadratic by nature
    (the same boundedness contract as mmr_select's candidate set). ρ
    uses per-side rank windows over the same bounded list. Ranks are
    tie-AVERAGED (the Spearman convention): per distinct score, rank =
    avg of the row_numbers — computed with one window + one
    distinct-value census per side. Both coefficients null when
    degenerate (n < 2, or zero variance — all scores tied on either
    side)."""
    from . import join_scalar_frame

    def avg_ranks(df: DataFrame, out: str) -> DataFrame:
        # row_number's intra-tie order is arbitrary, but the per-score
        # AVERAGE of row numbers is order-invariant — the tie convention
        rowed = df.select(
            "_id", F.col(score_col).alias("_s")
        ).withColumn(
            "_rn", F.row_number().over(Window.orderBy(F.col("_s").desc()))
        )
        avg = rowed.groupBy("_s").agg(F.avg("_rn").alias(out))
        return rowed.join(avg, "_s").select("_id", out)
    joined = (
        a.select(F.col(id_col).alias("_id"), F.col(score_col).alias("_sa"))
        .join(
            b.select(F.col(id_col).alias("_id"), F.col(score_col).alias("_sb")),
            "_id",
        )
        .localCheckpoint(eager=True)
    )
    ra = avg_ranks(joined.select("_id", F.col("_sa").alias(score_col)), "ra")
    rb = avg_ranks(joined.select("_id", F.col("_sb").alias(score_col)), "rb")
    xy = ra.join(rb, "_id")
    mom = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ra").alias("sx"),
        F.sum("rb").alias("sy"),
        F.sum(F.col("ra") * F.col("ra")).alias("sxx"),
        F.sum(F.col("rb") * F.col("rb")).alias("syy"),
        F.sum(F.col("ra") * F.col("rb")).alias("sxy"),
    )
    # Kendall tau-b over unordered id pairs (i < j)
    l = joined.select(
        F.col("_id").alias("i"), F.col("_sa").alias("xa"),
        F.col("_sb").alias("xb"),
    )
    r = joined.select(
        F.col("_id").alias("j"), F.col("_sa").alias("ya"),
        F.col("_sb").alias("yb"),
    )
    # constant-key equi component keeps this a hash join (single bucket
    # — the quadratic work is inherent to tau, the NestedLoop plan isn't)
    lk = l.withColumn("_pk", F.pmod(F.hash("i"), F.lit(1)))
    rk = r.withColumn("_pk", F.pmod(F.hash("j"), F.lit(1)))
    pairs = lk.join(
        rk, (lk["_pk"] == rk["_pk"]) & (F.col("i") < F.col("j"))
    )
    da = F.when(F.col("xa") > F.col("ya"), 1).when(
        F.col("xa") < F.col("ya"), -1
    ).otherwise(0)
    db = F.when(F.col("xb") > F.col("yb"), 1).when(
        F.col("xb") < F.col("yb"), -1
    ).otherwise(0)
    kt = pairs.agg(
        F.coalesce(F.sum(F.when(da * db > 0, 1).otherwise(0)), F.lit(0)).alias("c"),
        F.coalesce(F.sum(F.when(da * db < 0, 1).otherwise(0)), F.lit(0)).alias("d"),
        F.coalesce(F.sum(F.when((da == 0) & (db != 0), 1).otherwise(0)), F.lit(0)).alias("tx"),
        F.coalesce(F.sum(F.when((db == 0) & (da != 0), 1).otherwise(0)), F.lit(0)).alias("ty"),
    )
    both = join_scalar_frame(mom, kt)
    n = F.col("n")
    dx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    spear = F.when((n >= 2) & (dx > 0) & (dy > 0), cov / F.sqrt(dx * dy))
    cd = F.col("c") + F.col("d")
    tau = F.when(
        (cd + F.col("tx") > 0) & (cd + F.col("ty") > 0),
        (F.col("c") - F.col("d"))
        / F.sqrt((cd + F.col("tx")) * (cd + F.col("ty"))),
    )
    return both.select(
        n.cast("long").alias("n"),
        F.round(spear, 6).alias("spearman_r"),
        F.round(tau, 6).alias("kendall_r"),
    )


_INTERLEAVE_SCHEMA = (
    "query_id string, pos int, doc_id long, team string"
)


def team_draft_interleave(
    a: DataFrame,
    b: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Team-draft interleaving (Radlinski, Kurup & Joachims, CIKM 2008)
    — the online ranker A/B instrument: merge two rankings for the same
    query into ONE list the user sees, alternating picks like schoolyard
    team captains; the ranker whose picks get clicked wins the query.
    Input: two (query, doc, rank) run tables (rank 1-based); output one
    (query_id, pos, doc_id, team) row per interleaved slot.

    Each round one captain picks first (the other follows), and each
    captain takes its highest-ranked doc not already on the list. The
    coin is md5(query || round) — deterministic and engine-portable
    (`curation.col_hash_bucket` discipline), so reruns and retries build
    the identical list; a doc in both runs is credited to whichever team
    picked it first.

    Physical shape: the draft is sequential PER QUERY but queries are
    independent — grouped applyInPandas over query_id (the pack_bins_ffd
    discipline), each group bounded by the two top-k lists. No
    SQL-expressible form without recursion, so the correctness story is
    the pure-Python differential in tests, not a DuckDB oracle."""
    import hashlib

    import pandas as pd

    la = a.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(rank_col).cast("int").alias("rank"),
        F.lit("a").alias("_run"),
    )
    lb = b.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(rank_col).cast("int").alias("rank"),
        F.lit("b").alias("_run"),
    )

    def draft(pdf: pd.DataFrame) -> pd.DataFrame:
        q = str(pdf["query_id"].iloc[0])
        runs = {}
        for run in ("a", "b"):
            sub = pdf[pdf["_run"] == run].sort_values(["rank", "doc_id"])
            runs[run] = sub["doc_id"].tolist()
        chosen: set[int] = set()
        out = []
        ptr = {"a": 0, "b": 0}
        rnd = 0
        while ptr["a"] < len(runs["a"]) or ptr["b"] < len(runs["b"]):
            coin = int(
                hashlib.md5(f"{q}:{rnd}".encode()).hexdigest()[:8], 16
            ) % 2
            order = ("a", "b") if coin == 0 else ("b", "a")
            progressed = False
            for team in order:
                lst = runs[team]
                p = ptr[team]
                while p < len(lst) and lst[p] in chosen:
                    p += 1
                ptr[team] = p
                if p < len(lst):
                    doc = lst[p]
                    chosen.add(doc)
                    ptr[team] = p + 1
                    out.append((q, len(out) + 1, doc, team))
                    progressed = True
            if not progressed:
                break
            rnd += 1
        return pd.DataFrame(
            out, columns=["query_id", "pos", "doc_id", "team"]
        )

    return (
        la.unionByName(lb)
        .groupBy("query_id")
        .applyInPandas(draft, schema=_INTERLEAVE_SCHEMA)
    )


def _delete_variants(term: Column, include_self: bool = True) -> Column:
    """All single-character deletions of a term (plus the term itself
    when ``include_self``) — the SymSpell neighborhood generator, pure
    Catalyst: transform over char positions, concat of the two halves."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(term)),
        lambda i: F.concat(
            term.substr(F.lit(1), i - 1),
            term.substr(i + 1, F.length(term)),
        ),
    )
    dels = F.when(F.length(term) > 0, dels).otherwise(
        F.array().cast("array<string>")
    )
    if include_self:
        dels = F.array_union(F.array(term), dels)
    return F.array_distinct(dels)


def symspell_suggestions(
    docs: DataFrame,
    queries: DataFrame,
    n: int = 3,
    query_col: str = "query_term",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Whole-query-log spelling correction via the SymSpell delete
    neighborhood (Garbe 2012, the symmetric-delete algorithm LUCENE's
    FuzzySuggester family approximates): two terms are within edit
    distance 1 ONLY IF they share a member of each other's
    {self ∪ single-char-deletes} set — so candidate generation is one
    EQUI-join on precomputed delete variants, no edit-distance scan
    over the vocabulary. Where `term_suggestions` corrects ONE term per
    invocation (k-gram IN-list, per-query driver round trip), this
    corrects an entire query table in one job — the batch_bm25_topk
    serving shape applied to spelling.

    Returns (query_term, term, df, dist, rank): vocabulary terms within
    edit distance 1, ranked per query by (dist ASC, df DESC, term ASC),
    top-``n``. `levenshtein` runs ONLY on the equi-join survivors (the
    delete-share condition is necessary, not sufficient — transposition
    neighbors share a delete but sit at distance 2, so the verify step
    is what makes the result exact).

    Physical shape: vocab deletes = one transform+explode over the
    VOCABULARY census (≤ (len+1)·|vocab| rows); query deletes the same
    over the query table; one equi-join on the variant key; distinct
    (query, term) pairs before the quadratic verify; per-query rank
    window over ≤ a handful of verified candidates."""
    if n < 1:
        raise ValueError("n must be >= 1")
    vocab = document_frequency(postings(docs, id_col, text_col))
    vdel = vocab.select(
        "term", "df", F.explode(_delete_variants(F.col("term"))).alias("v")
    )
    q = queries.select(
        F.lower(F.trim(F.col(query_col))).alias("query_term")
    ).distinct()
    qdel = q.select(
        "query_term",
        F.explode(_delete_variants(F.col("query_term"))).alias("v"),
    )
    cand = (
        qdel.join(vdel, "v")
        .select("query_term", "term", "df")
        .distinct()
        .withColumn(
            "dist", F.levenshtein(F.col("query_term"), F.col("term"))
        )
        .filter(F.col("dist") <= 1)
    )
    w = Window.partitionBy("query_term").orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("term").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= n)
    )


def rbp_err_eval(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    p: float = 0.8,
    max_rel: int = 3,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """The user-model evaluation pair `retrieval_eval`'s TREC metrics
    leave out, per query:

    - **RBP@k** (rank-biased precision, Moffat & Zobel TOIS 2008):
      (1−p)·Σ_i rel?_i·p^(i−1) — models a user who inspects rank i+1
      with persistence p; unlike precision@k it degrades gracefully
      with depth and is stable under pool truncation. Binary relevance
      (rel > 0). Also emits ``rbp_residual_r`` = p^k, the mass an
      unjudged tail could still claim — RBP's built-in error bar.
    - **ERR@k** (expected reciprocal rank, Chapelle CIKM 2009):
      Σ_i (1/i)·R_i·Π_{j<i}(1−R_j) with R = (2^rel − 1)/2^max_rel —
      the cascade model: a highly relevant doc at rank 1 makes later
      ranks nearly worthless, which nDCG's additive gains miss.

    Both are rank-sequential products/sums over ≤ k judged rows per
    query — computed via one window keyed on the query (bounded by k,
    never corpus-sized) after the (query, doc) equi-join with the
    judgments. Rounded to 6. Unjudged queries in ``results`` emit 0
    scores; judged queries absent from results emit 0 too (the
    retrieval_eval silent-drop discipline, via full outer on the query
    set)."""
    if not 0 < p < 1:
        raise ValueError("p must be in (0, 1)")
    if k < 1 or max_rel < 1:
        raise ValueError("k and max_rel must be >= 1")
    res = results.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).alias("_rank"),
    ).filter(F.col("_rank") <= k)
    rels = qrels.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rel_col).alias("_rel"),
    )
    hits = res.join(rels, ["_q", "_d"], "left").select(
        "_q",
        "_rank",
        F.coalesce(F.col("_rel"), F.lit(0)).alias("_rel"),
    )
    r_prob = (F.pow(F.lit(2.0), F.col("_rel")) - 1) / F.lit(
        float(2**max_rel)
    )
    w = (
        Window.partitionBy("_q")
        .orderBy("_rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # survival probability of reaching this rank in the cascade model:
    # product of (1 - R_j) over earlier ranks, as exp(sum(log))
    surv = F.exp(
        F.coalesce(
            F.sum(F.log(F.lit(1.0) - r_prob + F.lit(1e-300))).over(w),
            F.lit(0.0),
        )
    )
    per_rank = hits.select(
        "_q",
        ((F.col("_rel") > 0).cast("double")
         * F.pow(F.lit(float(p)), F.col("_rank") - 1)).alias("_rbp_i"),
        (r_prob * surv / F.col("_rank")).alias("_err_i"),
    )
    scored = per_rank.groupBy(F.col("_q").alias(query_col)).agg(
        F.round(F.sum("_rbp_i") * (1 - p), 6).alias("rbp_r"),
        F.round(F.sum("_err_i"), 6).alias("err_r"),
    )
    all_q = (
        res.select(F.col("_q").alias(query_col))
        .unionByName(rels.select(F.col("_q").alias(query_col)))
        .distinct()
    )
    return all_q.join(scored, query_col, "left").select(
        query_col,
        F.coalesce("rbp_r", F.lit(0.0)).alias("rbp_r"),
        F.coalesce("err_r", F.lit(0.0)).alias("err_r"),
        F.round(F.lit(float(p) ** k), 6).alias("rbp_residual_r"),
    )
