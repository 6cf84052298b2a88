"""Trained character-n-gram language identification — the fastText/
CLD-style upgrade over `textqc.col_lang_id`'s fixed stopword heuristic.

A multinomial Naive Bayes over character trigrams, trained and scored
entirely as DataFrame aggregations (the public-textbook algorithm —
Cavnar & Trenkle 1994 n-gram categorization, NB formulation):

- **train** (`train_nb_langid`): one explode over the labelled corpus →
  one (label, gram) groupBy (map-side combined) → Lidstone-smoothed
  per-label log-probs. The vocabulary size rides the repo's 1-row
  scalar broadcast (`join_scalar_frame` — a BroadcastHashJoin, never a
  nested loop). Model size is |langs| × |char trigrams| — thousands of
  rows per language, broadcastable by construction.
- **score** (`nb_classify`): docs × labels (labels broadcast — there
  are dozens at most) left-joined with the gram table so absent grams
  fall back to the per-label unknown mass, summed per (doc, label),
  argmax by (score, label) so ties break deterministically and
  identically on every engine. Scoring reads only the first
  ``max_chars`` characters — language is decidable from a prefix, and
  an unbounded explode over 100 TB of text would dominate the job for
  no accuracy gain.

Both halves are pure Catalyst (no Python in the hot path) and
SQL-expressible, so the DuckDB oracle replays train+score end-to-end.

Scale notes: the gram census shuffles (label, gram) pairs — bounded by
vocabulary, not corpus (map-side combine collapses repeats per
partition). Scoring shuffles (doc, gram) once for the model join; with
the model broadcast (measured gate, same discipline as
`lm.doc_cross_entropy`) the join is map-side and the only shuffle is
the per-doc aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import join_scalar_frame

#: Above this many (label, gram) rows the model joins as a shuffle
#: instead of a broadcast (measured with a limit-bounded count, the
#: crawler.resolve_redirects discipline).
MODEL_BROADCAST_ROWS = 5_000_000


def col_char_ngrams(text: str | Column, n: int = 3, max_chars: int = 1000) -> Column:
    """All overlapping character n-grams of the first ``max_chars``
    chars, in order (with repeats — multinomial counts need them)."""
    c = F.col(text) if isinstance(text, str) else text
    head = F.substring(c, 1, max_chars)
    # Spark's sequence(1, 0) is DESCENDING [1, 0], not empty — gate the
    # short-doc case explicitly so a doc shorter than n yields [] grams.
    idx = F.when(
        F.length(head) >= n, F.sequence(F.lit(1), F.length(head) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.substring(head, i, n))


def train_nb_langid(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
    alpha: float = 0.5,
    max_chars: int = 1000,
    cache_counts: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Train the classifier: returns ``(grams, labels)``.

    ``grams``: (label, gram, log_prob) — Lidstone-smoothed
    log((c + α) / (total_label + α·(V + 1))) with V the corpus-wide
    distinct-gram vocabulary (shared across labels so the smoothing
    denominator is label-comparable).
    ``labels``: (label, log_prior, unk_log_prob) — document-frequency
    priors and the per-label unknown-gram mass.

    ``cache_counts`` persists the (label, gram, c) census — the one
    corpus-sized pass in training. Without it, every consumer of the
    returned frames (the vocab scalar, the label totals, the scoring
    join, AND the broadcast-gate probe in ``nb_classify``) re-runs the
    full explode over the corpus: 4-5 corpus scans for one model. The
    census itself is vocabulary-bounded (|labels| × |observed n-grams|),
    not corpus-bounded, so caching it is safe at any corpus scale —
    exactly the frame a 100 TB job would checkpoint between train and
    score."""
    base = docs.select(
        F.col(label_col).alias("label"),
        col_char_ngrams(text_col, n, max_chars).alias("grams"),
    )
    exploded = base.select("label", F.explode("grams").alias("gram"))
    counts = exploded.groupBy("label", "gram").agg(F.count(F.lit(1)).alias("c"))
    if cache_counts:
        counts = counts.cache()
    vocab = counts.select("gram").distinct().agg(
        F.count(F.lit(1)).alias("v_all")
    )
    label_totals = counts.groupBy("label").agg(F.sum("c").alias("total"))
    denom_side = join_scalar_frame(label_totals, vocab).select(
        "label",
        "total",
        (F.col("total") + F.lit(alpha) * (F.col("v_all") + 1)).alias("denom"),
    )
    grams = (
        counts.join(denom_side, "label")
        .select(
            "label",
            "gram",
            F.log((F.col("c") + F.lit(alpha)) / F.col("denom")).alias("log_prob"),
        )
    )
    n_docs = docs.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    label_docs = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("docs")
    )
    labels = (
        join_scalar_frame(label_docs, n_docs)
        .join(denom_side, "label")
        .select(
            "label",
            F.log(F.col("docs") / F.col("n_docs")).alias("log_prior"),
            F.log(F.lit(alpha) / F.col("denom")).alias("unk_log_prob"),
        )
    )
    return grams, labels


def _gated_broadcast(model: DataFrame, broadcast: bool | None) -> DataFrame:
    if broadcast is None:
        probe = model.limit(MODEL_BROADCAST_ROWS + 1).count()
        broadcast = probe <= MODEL_BROADCAST_ROWS
    return F.broadcast(model) if broadcast else model


def nb_classify(
    docs: DataFrame,
    grams: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_chars: int = 1000,
    broadcast: bool | None = None,
) -> DataFrame:
    """Predict a label per doc: (id, pred_label, score). Docs too short
    to yield a single n-gram are classified by prior alone. Exact score
    ties (possible: equal priors on gram-less docs) break to the
    LEXICOGRAPHICALLY GREATEST label — ``max(struct(score, label))``
    compares field-by-field, and the oracle mirrors it with
    ``ORDER BY score DESC, label DESC`` — deterministic and
    engine-portable."""
    doc_grams = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(col_char_ngrams(text_col, n, max_chars)).alias("gram"),
    )
    model = _gated_broadcast(grams.withColumnRenamed("label", "_label"), broadcast)
    # docs × labels rides the constant-key BroadcastHashJoin idiom
    # (join_scalar_frame) — a crossJoin(broadcast) would plan the
    # BroadcastNestedLoopJoin the repo's plan guards flag
    per_label_gram = (
        join_scalar_frame(
            doc_grams,
            labels.select(F.col("label").alias("_label"), "unk_log_prob"),
        )
        .join(model, ["gram", "_label"], "left")
        .groupBy("_id", "_label")
        .agg(
            F.sum(F.coalesce(F.col("log_prob"), F.col("unk_log_prob"))).alias(
                "gram_ll"
            )
        )
    )
    # every doc × label gets a base row (prior), so gram-less docs are
    # still classified
    base = join_scalar_frame(
        docs.select(F.col(id_col).alias("_id")),
        labels.select(F.col("label").alias("_label"), "log_prior"),
    )
    scored = base.join(per_label_gram, ["_id", "_label"], "left").select(
        "_id",
        "_label",
        (F.col("log_prior") + F.coalesce(F.col("gram_ll"), F.lit(0.0))).alias(
            "score"
        ),
    )
    best = scored.groupBy("_id").agg(
        F.max(F.struct(F.col("score"), F.col("_label"))).alias("best")
    )
    return best.select(
        F.col("_id").alias(id_col),
        F.col("best._label").alias("pred_label"),
        F.col("best.score").alias("score"),
    )


def langid_accuracy(
    docs: DataFrame,
    predictions: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "lang",
) -> DataFrame:
    """Per-label confusion rollup: (label, pred_label, n) — the train/
    eval report a corpus pipeline logs after (re)training the ID model."""
    return (
        docs.select(F.col(id_col), F.col(label_col).alias("label"))
        .join(predictions, id_col)
        .groupBy("label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def token_window_segments(
    docs: DataFrame,
    window_tokens: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, p_idx, text) — fixed whitespace-token windows, the
    segment source for `lang_mixture` when a corpus has no paragraph
    structure to split on (CCNet splits on lines; a single-line doc
    still needs segments to detect mid-document language switches).
    Pure array expressions — slice/transform/posexplode, no shuffle, no
    UDF; segments per doc bounded by doc length. Whitespace (not the
    index tokenizer) so non-alphanumeric scripts survive for the
    char-n-gram scorer."""
    if window_tokens < 1:
        raise ValueError("window_tokens must be >= 1")
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    w = int(window_tokens)
    # sequence(0, -1) would DESCEND on an empty doc — gate on size>0;
    # empty docs contribute no segments (same absence semantics as
    # postings over empty text)
    paras = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), F.ceil(F.size(toks) / w).cast("int") - 1),
            lambda i: F.array_join(F.slice(toks, i * w + 1, w), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(paras).alias("p_idx", "text")
    )


def lang_mixture(
    segment_preds: DataFrame,
    doc_col: str = "doc_id",
    label_col: str = "pred_label",
) -> DataFrame:
    """Per-document language-mixture rollup over per-segment
    predictions (CCNet's paragraph-level screening, Wenzek et al.
    LREC 2020: classify each paragraph, then judge the document by how
    uniform the verdicts are — a 10%-English doc should not pass an
    English filter on its header alone). Input is any (doc, label) table
    — `nb_classify` output over `token_window_segments` or real
    newline paragraphs.

    Returns (doc_id, n_segments, n_langs, majority_lang,
    majority_frac_r): majority = the label on the most segments, ties
    to the LEXICOGRAPHICALLY GREATEST label via max(struct(cnt, label))
    — the nb_classify argmax discipline, engine-portable. Two
    partial-agg censuses ((doc, label) counts, then per-doc max+sum) —
    no windows, no label lists, bounded by docs × languages."""
    counts = segment_preds.groupBy(
        F.col(doc_col).alias("doc_id"), F.col(label_col).alias("label")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_segments"),
        F.count(F.lit(1)).cast("int").alias("n_langs"),
        F.max(F.struct(F.col("cnt"), F.col("label"))).alias("_m"),
    ).select(
        "doc_id",
        "n_segments",
        "n_langs",
        F.col("_m.label").alias("majority_lang"),
        F.round(F.col("_m.cnt") / F.col("n_segments"), 6).alias(
            "majority_frac_r"
        ),
    )


# first <html ...> tag; lang attribute in the three quoting styles the
# meta-tag machinery already handles (metarobots._first_attr). \blang also
# matches xml:lang= (':' is a word boundary) — both declare the document
# language, so that is the desired behavior, not an accident.
_HTML_TAG_RE = "(?is)<html\\b[^>]*>"
_LANG_DQ_RE = "(?i)\\blang\\s*=\\s*\"([^\"]*)\""
_LANG_SQ_RE = "(?i)\\blang\\s*=\\s*'([^']*)'"
_LANG_UQ_RE = "(?i)\\blang\\s*=\\s*([^\\s\"'>/]+)"


def declared_lang_mismatch(
    pages: DataFrame,
    id_col: str = "url",
    html_col: str = "html",
    text_col: str = "text",
) -> DataFrame:
    """Declared-vs-detected language audit: (id, declared_lang,
    detected_lang, mismatch).

    ``declared_lang`` is the primary subtag of the first ``<html lang=…>``
    attribute (BCP 47 'en-US' → 'en', lowercased; absent/empty → null).
    ``detected_lang`` is the stopword-argmax heuristic the corpus lang
    column already verifies (`textqc.col_lang_id`). ``mismatch`` accuses
    only when BOTH sides are known: a missing attribute or an 'und'
    detection is evidence of nothing. Mislabeled lang attributes are
    endemic (template default 'en' on translated CMS pages) — CCNet/C4
    style pipelines that route by declared lang silently misfile those
    docs, so this audit belongs beside lang_mixture in the QC pass.

    Map-only codegen projection — no shuffle, no UDF."""
    from ..metarobots import _first_attr
    from . import textqc

    html = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    tag = F.regexp_extract(html, _HTML_TAG_RE, 0)
    raw = _first_attr(tag, _LANG_DQ_RE, _LANG_SQ_RE, _LANG_UQ_RE)
    declared = F.nullif(
        F.lower(F.regexp_extract(raw, "^([A-Za-z]{2,3})", 1)), F.lit("")
    )
    detected = textqc.col_lang_id(F.coalesce(F.col(text_col), F.lit("")))
    return pages.select(
        F.col(id_col).alias("id"),
        declared.alias("declared_lang"),
        detected.alias("detected_lang"),
        (
            declared.isNotNull()
            & (detected != "und")
            & (declared != detected)
        ).alias("mismatch"),
    )
