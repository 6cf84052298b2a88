"""Text analysis for corpus QC: language-ID, quality scoring, token
counting, document fingerprinting.

Everything except the winnowing fingerprint is pure Catalyst (split /
regexp / array expressions — whole-stage codegen, no Python in the hot
path), so these run at scan speed over 100 TB of text.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Tiny deterministic stopword inventories per language (heuristic lang-ID;
# a real deployment would swap in fastText — same plumbing).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "on", "with", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "für", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "con", "por"],
    "fr": ["le", "la", "et", "les", "des", "en", "du", "que", "une", "dans"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "也"],
}


def col_tokens(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def col_token_count(text_col: str | Column) -> Column:
    return F.size(col_tokens(text_col))


def col_bpe_ish_token_count(text_col: str | Column) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation runs
    with a GPT-style pre-tokenizer regex (approximation; the real tokenizer
    is a lookup the pipeline would apply downstream)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    pieces = F.regexp_extract_all(c, F.lit(r"([A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+)"), 1)
    return F.size(pieces)


def col_punct_ratio(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def col_stopword_ratio(text_col: str | Column, lang: str = "en") -> Column:
    toks = F.transform(col_tokens(text_col), lambda t: F.lower(t))
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS[lang])))
    n = F.size(toks)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def col_avg_word_len(text_col: str | Column) -> Column:
    toks = col_tokens(text_col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def col_quality_score(text_col: str | Column, lang: str = "en") -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    sane punctuation + sane word length. Deterministic, explainable, cheap —
    the C4/Gopher-rule style of filter."""
    n_tokens = col_token_count(text_col)
    length_ok = F.when((n_tokens >= 20) & (n_tokens <= 100000), 1.0).otherwise(
        F.when(n_tokens >= 5, 0.5).otherwise(0.0)
    )
    sw = col_stopword_ratio(text_col, lang)
    sw_ok = F.when(sw >= 0.01, 1.0).otherwise(F.lit(0.0))
    punct = col_punct_ratio(text_col)
    punct_ok = F.when(punct <= 0.2, 1.0).otherwise(F.lit(0.0))
    awl = col_avg_word_len(text_col)
    awl_ok = F.when((awl >= 2.0) & (awl <= 12.0), 1.0).otherwise(F.lit(0.0))
    return (length_ok + sw_ok + punct_ok + awl_ok) / 4


def col_lang_scores(text_col: str | Column) -> Column:
    """Map of lang → stopword-hit count (the evidence vector)."""
    toks = F.transform(col_tokens(text_col), lambda t: F.lower(t))
    entries = [
        F.struct(
            F.lit(lang).alias("lang"),
            F.size(F.filter(toks, lambda t: t.isin(words))).alias("hits"),
        )
        for lang, words in STOPWORDS.items()
    ]
    return F.array(*entries)


def col_lang_id(text_col: str | Column) -> Column:
    """argmax language by stopword hits; 'und' (undetermined) when no
    stopword of any language appears. Ties break by language-code order
    (deterministic)."""
    # array_max over (hits, lang) structs: max hits, ties broken by the
    # lexicographically greatest lang code — fixed and deterministic.
    scores = F.transform(
        col_lang_scores(text_col),
        lambda s: F.struct(s["hits"].alias("hits"), s["lang"].alias("lang")),
    )
    best = F.array_max(scores)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def col_fingerprint(text_col: str | Column) -> Column:
    """Whole-document fingerprint: sha2 over whitespace-normalized lowercase
    text — the exact-dup identity used by the dedup pass."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.sha2(norm, 256)


def winnowing_fingerprints_udf(k: int = 5, window: int = 4):
    """Winnowing (Schleimer et al. '03): k-gram rolling hashes, min per
    sliding window → sparse robust fingerprint set per document."""

    @pandas_udf("array<long>")
    def fp(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            out = []
            for t in texts:
                toks = (t or "").lower().split()
                if len(toks) < k:
                    out.append([])
                    continue
                hs = np.fromiter(
                    (zlib.crc32(" ".join(toks[i : i + k]).encode("utf-8")) for i in range(len(toks) - k + 1)),
                    dtype=np.int64,
                )
                if len(hs) <= window:
                    out.append(np.unique(hs).tolist())
                    continue
                mins = pd.Series(hs).rolling(window).min().dropna().astype(np.int64)
                out.append(np.unique(mins.to_numpy()).tolist())
            yield pd.Series(out)

    return fp


def col_ngrams(text_col: str | Column, n: int = 2) -> Column:
    """Word n-gram array (space-joined), pure Catalyst. Empty array when the
    document has fewer than ``n`` tokens — ``sequence`` must be guarded
    because Spark's sequence(1, 0) counts DOWN instead of returning []."""
    toks = col_tokens(text_col)
    lower = F.transform(toks, lambda t: F.lower(t))
    gram = lambda i: F.array_join(F.slice(lower, i, n), " ")  # noqa: E731
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), gram),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", ngram_n: int = 2
) -> DataFrame:
    """Gopher-style repetition quality signals per document
    (arXiv:2112.11446 §A1.1 — the public repetition-filter recipe):

    - ``n_words``            token count
    - ``dup_word_frac``      1 − distinct/total words (in-doc word repetition)
    - ``dup_ngram_frac``     1 − distinct/total n-grams
    - ``top_ngram_frac``     occurrences of the most frequent n-gram / total

    The distinct-ratio signals are pure codegen expressions (no shuffle).
    ``top_ngram_frac`` needs the modal n-gram count, computed the
    scale-right way: explode → partial-agg groupBy(doc, gram) → groupBy(doc)
    max — two map-side-combining shuffles keyed by (doc, gram), never a
    per-doc Python pass, so a 10k-token doc costs O(n) not O(n²).

    ``base`` deliberately feeds two branches UNPERSISTED: the gram arrays
    are corpus-sized, so caching them would pin ~the whole corpus in
    executor storage at 100 TB — recomputing the tokenize+gram expressions
    on a second scan is map-side-cheap and caches nothing."""
    toks = col_tokens(text_col)
    lower = F.transform(toks, lambda t: F.lower(t))
    grams = col_ngrams(text_col, ngram_n)
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_words"),
        F.size(F.array_distinct(lower)).alias("n_distinct_words"),
        grams.alias("_grams"),
    )
    frac = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 4
    )
    top = (
        base.select(id_col, F.explode("_grams").alias("gram"))
        .groupBy(id_col, "gram")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("_top"), F.sum("count").alias("_total"))
    )
    return (
        base.select(
            id_col,
            "n_words",
            frac(F.col("n_words") - F.col("n_distinct_words"), F.col("n_words")).alias(
                "dup_word_frac"
            ),
            F.size("_grams").alias("_n_grams"),
            F.size(F.array_distinct("_grams")).alias("_n_distinct_grams"),
        )
        .join(top, id_col, "left")
        .select(
            id_col,
            "n_words",
            "dup_word_frac",
            frac(F.col("_n_grams") - F.col("_n_distinct_grams"), F.col("_n_grams")).alias(
                "dup_ngram_frac"
            ),
            frac(F.coalesce(F.col("_top"), F.lit(0)), F.coalesce(F.col("_total"), F.lit(0))).alias(
                "top_ngram_frac"
            ),
        )
    )


def boilerplate_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate census (the CCNet/C4 shared-shingle idea):
    an n-gram appearing in ≥ ``min_docs`` DISTINCT documents is boilerplate;
    each document reports what fraction of its n-gram occurrences are
    boilerplate (high fraction ⇒ template/nav page, drop before training).

    Scale shape: per-doc-distinct grams (array_distinct BEFORE the explode,
    so the cross-doc census shuffles each (doc, gram) once, not per
    occurrence) → groupBy(gram) count ⇒ the boilerplate set → semi-join
    back against per-doc occurrences keyed on the gram string. At 100 TB
    the gram key would be xxhash64(gram) to cut shuffle width — semantics
    identical, kept as the string here for oracle parity. Like
    ``repetition_signals``, the gram table feeds its three branches
    UNPERSISTED: caching corpus-sized gram arrays would pin ~the corpus in
    executor storage (and leak it past the call), while re-scanning is
    map-side-cheap."""
    grams = col_ngrams(text_col, ngram_n)
    base = df.select(F.col(id_col), grams.alias("_grams"))
    per_doc_distinct = base.select(
        id_col, F.explode(F.array_distinct("_grams")).alias("gram")
    )
    boiler = (
        per_doc_distinct.groupBy("gram")
        .count()
        .filter(F.col("count") >= min_docs)
        .select("gram")
    )
    occurrences = base.select(id_col, F.explode("_grams").alias("gram"))
    boiler_counts = (
        occurrences.join(boiler, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("_boiler"))
    )
    out = (
        base.select(F.col(id_col), F.size("_grams").alias("n_grams"))
        .join(boiler_counts, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.round(
                F.when(
                    F.col("n_grams") > 0,
                    F.coalesce(F.col("_boiler"), F.lit(0)).cast("double") / F.col("n_grams"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("boilerplate_frac"),
        )
    )
    return out


# Gopher (Rae et al. 2021, appendix A1.1) document-quality rule set.
# Published constants restated verbatim; markers kept to an explicit,
# documented inventory so the oracle can restate them identically.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_BULLETS = ["•", "-", "*"]


def gopher_quality_flags(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The full Gopher appendix-A1.1 quality rule set, pure Catalyst (one
    codegen projection — scan speed at 100 TB):

    - 50 ≤ word count ≤ 100,000
    - 3 ≤ mean word length ≤ 10
    - symbol-to-word ratio ('#', '...' or '…') ≤ 0.1
    - < 90% of (non-blank) lines start with a bullet marker
    - < 30% of (non-blank) lines end with an ellipsis
    - ≥ 80% of words contain ≥1 ASCII alphabetic character
    - ≥ 2 DISTINCT words from Gopher's 8-stop-word list

    Emits the per-rule metrics (rounded for cross-engine float parity),
    each rule verdict, and the conjunction ``gopher_keep``. The repetition
    rules from the same appendix live in ``repetition_signals``; compose
    both for the paper's complete filter."""
    c = F.col(text_col)
    toks = col_tokens(text_col)
    n_words = F.size(toks)
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n_words,
    ).otherwise(F.lit(0.0))
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    # Gopher A1.1 treats the Unicode ellipsis as an ellipsis symbol too —
    # counted here AND in the line-end rule below (consistent within the
    # rule set; the DuckDB oracle restates the same alternation)
    n_ellipsis = F.size(F.regexp_extract_all(c, F.lit(r"\.\.\.|…"), 0))
    symbol_ratio = F.when(n_words > 0, (n_hash + n_ellipsis) / n_words).otherwise(F.lit(0.0))
    lines = F.filter(
        F.transform(F.split(c, r"\n"), lambda x: F.trim(x)), lambda x: x != ""
    )
    n_lines = F.size(lines)
    bullet_starts = F.filter(
        lines, lambda x: F.substring(x, 1, 1).isin(GOPHER_BULLETS)
    )
    ellipsis_ends = F.filter(
        lines, lambda x: x.endswith("...") | x.endswith("…")
    )
    frac_bullet = F.when(n_lines > 0, F.size(bullet_starts) / n_lines).otherwise(F.lit(0.0))
    frac_ellip = F.when(n_lines > 0, F.size(ellipsis_ends) / n_lines).otherwise(F.lit(0.0))
    alpha_words = F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    frac_alpha = F.when(n_words > 0, F.size(alpha_words) / n_words).otherwise(F.lit(0.0))
    low = F.transform(toks, lambda t: F.lower(t))
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            lambda w: F.array_contains(low, w),
        )
    )
    flags = {
        "word_count_ok": (n_words >= 50) & (n_words <= 100_000),
        "mean_word_len_ok": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "symbol_ratio_ok": symbol_ratio <= 0.1,
        "bullet_lines_ok": frac_bullet < 0.9,
        "ellipsis_lines_ok": frac_ellip < 0.3,
        "alpha_words_ok": frac_alpha >= 0.8,
        "stopwords_ok": n_stop >= 2,
    }
    keep = None
    for f in flags.values():
        keep = f if keep is None else (keep & f)
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.round(frac_bullet, 4).alias("frac_bullet_lines"),
        F.round(frac_ellip, 4).alias("frac_ellipsis_lines"),
        F.round(frac_alpha, 4).alias("frac_alpha_words"),
        n_stop.alias("n_stopword_kinds"),
        *[v.alias(k) for k, v in flags.items()],
        keep.alias("gopher_keep"),
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    min_count: int = 3,
) -> DataFrame:
    """Corpus-level line deduplication (the C4 rule: any line occurring
    ≥ ``min_count`` times ACROSS the corpus is removed from every document;
    CCNet applies the same idea per paragraph). Returns one row per input
    document: line counts plus the cleaned text with surviving lines in
    original order.

    Lines are normalized (lowercase, trim, collapse internal whitespace)
    for the census; removal applies to the ORIGINAL line, and blank lines
    are dropped outright. Scale shape: posexplode keeps the original
    position so reassembly is a per-doc ``array_sort`` over that doc's own
    lines (bounded by document size — never a global sort); the cross-doc
    census is one partial-agg shuffle keyed on the normalized line with no
    ids riding it, and the dup set joins back by key (at 100 TB the key
    would be ``xxhash64(norm)`` to cut shuffle width — kept as the string
    here for oracle parity, like ``boilerplate_ngrams``)."""
    lines = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), delim)).alias("pos", "line")
    ).withColumn("norm", F.lower(F.trim(F.regexp_replace("line", r"\s+", " "))))
    lines = lines.filter(F.col("norm") != "")
    dup_keys = (
        lines.groupBy("norm").count().filter(F.col("count") >= min_count).select("norm")
    )
    flagged = lines.join(
        dup_keys.withColumn("_dup", F.lit(True)), "norm", "left"
    ).withColumn("_dup", F.coalesce(F.col("_dup"), F.lit(False)))
    kept_line = F.when(~F.col("_dup"), F.col("line"))
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("_dup").cast("int")).alias("n_dup_lines"),
            F.array_join(
                # array_sort on (pos, line) structs orders by pos; dup slots
                # carry NULL line and array_join skips them
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("pos"), kept_line.alias("l")))),
                    lambda s: s.l,
                ),
                delim,
            ).alias("clean_text"),
        )
        .select(id_col, "n_lines", "n_dup_lines", "clean_text")
    )


C4_TERMINAL_PUNCT = [".", "!", "?", '"']


def c4_line_filters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    badwords: list[str] | None = None,
) -> DataFrame:
    """The C4 line/page cleaning rules (Raffel et al. 2020 §2.2), pure
    Catalyst. Line rules (a line survives only if ALL hold): ends in a
    terminal punctuation mark (. ! ? \"), has ≥ ``min_words_per_line``
    words, and does not contain the word 'javascript' (case-insensitive).
    Page rules (first-match-wins drop reason, same chain style as
    ``clean_corpus``): contains '{' → curly_brace; contains 'lorem ipsum'
    → lorem_ipsum; contains a configured badword → badword; fewer than
    ``min_kept_lines`` surviving lines → too_few_lines. Kept pages emit
    the cleaned text (surviving lines, original order).

    One projection per doc — no shuffle anywhere: the per-line work is
    array expressions over that doc's own lines (bounded by doc size).
    The paper's three-sentence-span dedup is corpus-level and lives in
    ``line_dedup``; compose both for the full C4 pipeline."""
    c = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(c, r"\n"), lambda x: F.trim(x)), lambda x: x != ""
    )

    def line_ok(x):
        words = F.size(F.filter(F.split(x, r"\s+"), lambda t: t != ""))
        punct = F.substring(x, -1, 1).isin(C4_TERMINAL_PUNCT)
        no_js = ~F.lower(x).contains("javascript")
        return punct & (words >= min_words_per_line) & no_js

    kept = F.filter(lines, line_ok)
    low = F.lower(c)
    reason = F.when(c.contains("{"), F.lit("curly_brace")).when(
        low.contains("lorem ipsum"), F.lit("lorem_ipsum")
    )
    for w in badwords or []:
        reason = reason.when(low.contains(w.lower()), F.lit("badword"))
    reason = reason.when(F.size(kept) < min_kept_lines, F.lit("too_few_lines"))
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        reason.alias("drop_reason"),
        reason.isNull().alias("keep"),
        F.when(reason.isNull(), F.array_join(kept, "\n")).alias("clean_text"),
    )


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    allowed_langs: tuple[str, ...] = ("en",),
    max_dup_word_frac: float = 0.6,
    max_top_ngram_frac: float = 0.1,
) -> DataFrame:
    """C4/Gopher-style corpus-cleaning disposition: every document gets a
    keep/drop verdict with a FIRST-MATCH-WINS drop reason (the detector-
    chain pattern of §2.6, applied to data curation):

        too_short → lang → repetition → duplicate → keep

    Returns ``(id, keep BOOLEAN, drop_reason STRING nullable)`` — a
    disposition ledger rather than a filtered table, so pipelines can audit
    drop rates per reason before discarding anything.

    Thresholds compare the ROUNDED signals from ``repetition_signals``
    (stable across summation orders); exact-dup keep-first is a window
    over md5(text) ordered by id — the same keep-first-by-encounter-order
    rule the crawl uses for links."""
    from pyspark.sql import Window

    rep = repetition_signals(df, id_col=id_col, text_col=text_col)
    w = Window.partitionBy(F.md5(F.encode(F.col(text_col), "utf-8"))).orderBy(id_col)
    base = df.select(
        F.col(id_col),
        col_lang_id(text_col).alias("_lang"),
        F.row_number().over(w).alias("_rn"),
    )
    j = base.join(rep, id_col)
    reason = (
        F.when(F.col("n_words") < min_tokens, F.lit("too_short"))
        .when(~F.col("_lang").isin(*allowed_langs), F.lit("lang"))
        .when(
            (F.col("dup_word_frac") > max_dup_word_frac)
            | (F.col("top_ngram_frac") > max_top_ngram_frac),
            F.lit("repetition"),
        )
        .when(F.col("_rn") > 1, F.lit("duplicate"))
    )
    return j.select(F.col(id_col), reason.isNull().alias("keep"), reason.alias("drop_reason"))


#: Soft-404 phrase alternation — ASCII literals only, `(?i)` inline
#: flag and `\b` boundaries behave identically under Java regex and
#: DuckDB's RE2, so the ORACLE INLINES THIS EXACT STRING. Heuristic per
#: Bar-Yossef et al., "Sic transit gloria telae" (WWW'04): servers that
#: answer 200 with an error page.
SOFT404_RE = (
    r"(?i)\b(page not found|404 not found|error 404|http 404"
    r"|no longer available|page does not exist|page cannot be found"
    r"|page unavailable|nothing was found)\b"
)

#: Soft-404 phrase must appear this early — real articles QUOTING an
#: error phrase deep in their body shouldn't be dropped.
SOFT404_HEAD_CHARS = 400

#: 200-status pages at/below this token count are suspicious on their
#: own (empty templates); combined with a phrase hit they are certain.
SOFT404_TINY_TOKENS = 20


def soft404_flags(
    pages: DataFrame,
    status_col: str = "status",
    text_col: str = "text",
    head_chars: int = SOFT404_HEAD_CHARS,
    tiny_tokens: int = SOFT404_TINY_TOKENS,
) -> DataFrame:
    """Soft-404 detection: 200-status responses that are really error
    pages. Emits per-signal columns plus the verdict — a crawler drops
    the page from the corpus AND distrusts its outlinks (error
    templates link to the site chrome, not content).

    ``soft404`` = status 200 AND an error phrase in the first
    ``head_chars`` chars; ``suspect_tiny`` additionally marks 200-pages
    at/below ``tiny_tokens`` tokens (audit column — tiny alone is not
    a verdict, landing pages are legitimately short). Pure codegen
    projection, no shuffle, no Python.
    """
    status = F.col(status_col)
    body = F.coalesce(
        F.col(text_col) if isinstance(text_col, str) else text_col, F.lit("")
    )
    head = F.substring(body, 1, head_chars)
    phrase_hit = head.rlike(SOFT404_RE)
    tiny = col_token_count(body) <= tiny_tokens
    return pages.select(
        "*",
        phrase_hit.alias("s404_phrase"),
        ((status == 200) & tiny).alias("suspect_tiny"),
        ((status == 200) & phrase_hit).alias("soft404"),
    )


def quality_report(df: DataFrame, text_col: str = "text", lang_col: str | None = None) -> DataFrame:
    """Per-document QC columns, one codegen stage, no shuffle."""
    lang = F.col(lang_col) if lang_col else col_lang_id(text_col)
    return df.select(
        "*",
        col_token_count(text_col).alias("n_tokens"),
        col_punct_ratio(text_col).alias("punct_ratio"),
        col_avg_word_len(text_col).alias("avg_word_len"),
        col_quality_score(text_col).alias("quality_score"),
        col_lang_id(text_col).alias("lang_pred"),
        col_fingerprint(text_col).alias("fingerprint"),
    )


def readability_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch Reading Ease per document (Flesch 1948; Kincaid et al. 1975
    for the grade variant) — the readability band curation pipelines use
    as a quality prior next to the Gopher/C4 rules (very low FRE flags
    boilerplate/legalese; implausibly high flags word salad).

    Engine-portable spec (every piece restatable in SQL):
    - words = runs of [a-z] in the lowercased text;
    - syllables(word) = max(1, number of [aeiouy]+ vowel-group runs) —
      the classic heuristic, deliberately dictionary-free;
    - sentences = max(1, number of [.!?]+ terminator runs) — a text with
      words but no terminal punctuation counts as one sentence;
    - FRE = 206.835 − 1.015·(W/S) − 84.6·(Syl/W), rounded to 6; null
      when the text has no words.

    Pure codegen projection (regex + higher-order array fold) — map-only
    at any corpus size. Returns (doc_id, n_words, n_sentences,
    n_syllables, flesch_r)."""
    c = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    words = F.regexp_extract_all(c, F.lit("([a-z]+)"), 1)
    n_words = F.size(words)
    n_sent = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(c, F.lit("([.!?]+)"), 1))
    )
    syl = F.aggregate(
        F.transform(
            words,
            lambda w: F.greatest(
                F.lit(1), F.size(F.regexp_extract_all(w, F.lit("([aeiouy]+)"), 1))
            ),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    fre = F.when(
        n_words > 0,
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (n_words / n_sent)
            - F.lit(84.6) * (syl / n_words),
            6,
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        F.when(n_words > 0, n_sent).otherwise(F.lit(0)).alias("n_sentences"),
        F.when(n_words > 0, syl).otherwise(F.lit(0)).alias("n_syllables"),
        fre.alias("flesch_r"),
    )


def collocations_pmi(
    docs: DataFrame,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adjacent-bigram collocations by pointwise mutual information
    (Church & Hanks 1990) — the corpus-linguistics census that surfaces
    multiword units ("new york", "machine learning") for phrase-aware
    tokenization and boilerplate spotting.

    Spec: tokens are the index tokenizer's [a-z0-9] runs; bigrams are
    ADJACENT token pairs within a document (never across documents);
    PMI = ln( (c12/Nb) / ((c1/Nu)·(c2/Nu)) ) with Nb = total bigram
    occurrences and Nu = total token occurrences corpus-wide, rounded
    to 6. ``min_count`` floors c12 — PMI is famously unstable on
    hapaxes, and the floor also caps the output size.

    Physical shape, 100 TB first: the bigram census is one partial-agg
    shuffle keyed on (w1, w2), bounded by DISTINCT adjacent pairs (not
    token occurrences — map-side combine eats the repetition); the
    unigram census is vocabulary-sized; each rides a broadcast-able
    equi-join back onto the filtered bigram table, and both corpus
    totals ride the 1-row constant-key BroadcastHashJoin
    (join_scalar_frame). min_count filters BEFORE the unigram joins so
    only surviving pairs shuffle. Returns (w1, w2, c12, c1, c2, pmi_r).
    """
    from . import join_scalar_frame
    from .index import col_index_tokens

    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    toks = docs.select(col_index_tokens(text_col).alias("_t"))
    n = F.size("_t")
    bigrams = toks.select(
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice("_t", 1, n - 1),
                    F.slice("_t", 2, n - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array())
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    big = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= min_count)
    )
    uni = (
        toks.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = join_scalar_frame(
        bigrams.groupBy().agg(F.count(F.lit(1)).alias("nb")),
        uni.groupBy().agg(F.coalesce(F.sum("c"), F.lit(0)).alias("nu")),
    )
    joined = (
        big.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
    )
    return join_scalar_frame(joined, totals).select(
        "w1",
        "w2",
        "c12",
        "c1",
        "c2",
        F.round(
            F.log(
                (F.col("c12") / F.col("nb"))
                / ((F.col("c1") / F.col("nu")) * (F.col("c2") / F.col("nu")))
            ),
            6,
        ).alias("pmi_r"),
    )


def tokenizer_fertility(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer-fertility ledger (the tokenizer-QA numbers every
    training-data pipeline tracks — fertility creep is how a corpus
    silently doubles its token bill): per doc, whitespace words,
    BPE-ish pieces (the GPT-style pre-tokenizer regex), characters, and
    the two ratios that matter — fertility = pieces/word (≈1 for clean
    prose, >>1 for mojibake/code/URL soup) and chars/piece (compression;
    low = the tokenizer is shredding). Empty docs carry null ratios.
    Pure projection, no shuffle; corpus rollups are one agg away."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    words = col_token_count(c)
    pieces = col_bpe_ish_token_count(c)
    chars = F.length(c)
    return docs.select(
        F.col(id_col),
        words.alias("n_words"),
        pieces.alias("n_pieces"),
        chars.alias("n_chars"),
        F.round(
            F.when(words > 0, pieces.cast("double") / words), 6
        ).alias("fertility_r"),
        F.round(
            F.when(pieces > 0, chars.cast("double") / pieces), 6
        ).alias("chars_per_piece_r"),
    )


def term_drift_kl(
    prev: DataFrame,
    curr: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    top_contributors: int = 20,
) -> DataFrame:
    """Corpus term-distribution drift between two crawl snapshots:
    smoothed KL(curr ‖ prev) plus the top contributing terms — the
    drift alarm that says WHAT changed, where ``zipf_fit`` only says
    THAT the shape bent. Add-α smoothing over the union vocabulary keeps
    every term finite (a term newborn in curr has prev-mass α/(N_p+αV));
    contribution(t) = q(t)·ln(q(t)/p(t)), KL = Σ contributions.

    One unigram census per side (partial-agg, vocab-bounded), a
    full-outer join on term, two scalar hash-joins for the totals. Output
    row 1 is the corpus total (term='__TOTAL__', kl_r = full KL); rows
    2..k+1 the top drift contributors by |contribution| (ties → term) —
    one frame so the alarm and its explanation travel together."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    if top_contributors < 0:
        raise ValueError("top_contributors must be >= 0")
    from . import join_scalar_frame

    def census(df):
        return (
            df.select(
                F.explode(
                    F.filter(
                        F.split(
                            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                            r"[^a-z0-9]+",
                        ),
                        lambda t: t != "",
                    )
                ).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    pc = census(prev).select("term", F.col("c").alias("pc"))
    cc = census(curr).select("term", F.col("c").alias("cc"))
    j = pc.join(cc, "term", "full_outer").select(
        "term",
        F.coalesce("pc", F.lit(0)).alias("pc"),
        F.coalesce("cc", F.lit(0)).alias("cc"),
    )
    tot = j.groupBy().agg(
        F.sum("pc").cast("double").alias("np"),
        F.sum("cc").cast("double").alias("nc"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    scored = join_scalar_frame(j, tot).select(
        "term",
        (
            ((F.col("cc") + alpha) / (F.col("nc") + alpha * F.col("v")))
            * F.log(
                ((F.col("cc") + alpha) / (F.col("nc") + alpha * F.col("v")))
                / ((F.col("pc") + alpha) / (F.col("np") + alpha * F.col("v")))
            )
        ).alias("contrib"),
    )
    total = scored.agg(
        F.lit("__TOTAL__").alias("term"),
        F.round(F.sum("contrib"), 6).alias("kl_r"),
    )
    top = (
        scored.orderBy(F.abs(F.col("contrib")).desc(), F.col("term").asc())
        .limit(top_contributors)
        .select("term", F.round("contrib", 6).alias("kl_r"))
    )
    return total.unionByName(top)


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    iters: int = 2,
    damping: float = 0.85,
    min_len: int = 2,
) -> DataFrame:
    """Corpus keyword ranking by TextRank (Mihalcea & Tarau, EMNLP 2004):
    weighted PageRank over the word co-occurrence graph — nodes are
    terms, an edge per ADJACENT token pair (the window-2 form), weight =
    corpus-wide adjacency count, symmetric (both directions, the paper's
    undirected graph on a directed engine). Centrality beats raw
    frequency: a term bridging many contexts outranks one repeated
    inside a single boilerplate phrase. Stopword policy composes
    upstream (filter text first); ``min_len`` drops 1-char noise tokens.

    Scale shape: the bigram census is one (w1, w2) partial-agg shuffle
    bounded by distinct adjacent pairs (collocations_pmi's shape), then
    ``graph.weighted_pagerank``'s O(|E|)-per-sweep joins. Returns
    (term, rank_r)."""
    from .graph import weighted_pagerank

    if min_len < 1:
        raise ValueError("min_len must be >= 1")
    toks = F.filter(
        F.split(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"[^a-z0-9]+"
        ),
        lambda t: F.length(t) >= min_len,
    )
    pairs = (
        docs.select(toks.alias("_t"))
        .select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                    F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .where(F.col("w1") != F.col("w2"))
    )
    counted = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    sym = counted.select(
        F.col("w1").alias("src"), F.col("w2").alias("dst"), F.col("c").alias("weight")
    ).unionByName(
        counted.select(
            F.col("w2").alias("src"), F.col("w1").alias("dst"), F.col("c").alias("weight")
        )
    )
    # a↔b adjacency in both text orders merges into one weighted edge
    edges = sym.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    ranks = weighted_pagerank(edges, iters=iters, damping=damping)
    return ranks.select(F.col("node").alias("term"), F.round("rank", 6).alias("rank_r"))


def zipf_fit(
    docs: DataFrame,
    k: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Zipf rank-frequency fit over the top-``k`` vocabulary — the
    corpus-health one-liner (Zipf 1949): natural text fits ln(freq) ≈
    intercept + slope·ln(rank) with slope ≈ −1; synthetic, templated, or
    spam-heavy corpora bend away from it, so (slope, r²) is a cheap
    whole-corpus drift alarm next to the per-doc QC rules.

    Spec: ranks are 1-based over (freq DESC, term ASC); the fit is OLS
    of y = ln(freq) on x = ln(rank) over the top-k terms only — the
    head is where Zipf holds and, deliberately, what keeps the ranking
    distributed-safe: the global order is orderBy().limit(k) →
    TakeOrderedAndProject (per-partition heaps), and the rank window
    runs over ≤k survivors, never the full vocabulary. Returns one row
    (n_terms, slope_r, intercept_r, r2_r), rounded to 6; degenerate
    fits (fewer than 2 terms, or zero x-variance) yield nulls."""
    from pyspark.sql import Window

    from .index import col_index_tokens

    if k < 2:
        raise ValueError("k must be >= 2")
    census = (
        docs.select(F.explode(col_index_tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    topk = census.orderBy(F.col("c").desc(), F.col("w").asc()).limit(k)
    w = Window.orderBy(F.col("c").desc(), F.col("w").asc())
    xy = topk.withColumn("rank", F.row_number().over(w)).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    agg = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    dx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when((n >= 2) & (dx > 0), cov / dx)
    return agg.select(
        n.cast("long").alias("n_terms"),
        F.round(slope, 6).alias("slope_r"),
        F.round(
            F.when(slope.isNotNull(), (F.col("sy") - slope * F.col("sx")) / n),
            6,
        ).alias("intercept_r"),
        F.round(
            F.when(slope.isNotNull() & (dy > 0), (cov * cov) / (dx * dy)),
            6,
        ).alias("r2_r"),
    )


def heaps_fit(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (Heaps 1978; Manning IIR §5.1.1:
    V = k·N^β, β ≈ 0.4–0.6 for natural English) across corpus slices:
    each ``group_col`` value contributes one (N = total index tokens,
    V = distinct terms) point; the fit is OLS of ln V on ln N over the
    slice points. The drift alarm COMPLEMENTARY to `zipf_fit`: Zipf
    watches the head of the frequency distribution, Heaps watches the
    tail's growth rate — β drifting UP means vocabulary explosion
    (garbled encodings, spam keyword stuffing, tokenizer mismatch);
    β collapsing toward 0 means a templated/boilerplate corpus. Also
    the index-sizing input: the dictionary half of `postings` grows as
    k·N^β, so (k, β) projects dictionary size at 100 TB from today's
    slices.

    Returns one row (n_points, beta_r, lnk_r, r2_r), rounded to 6;
    degenerate fits (fewer than 2 slices, or zero ln-N variance) yield
    nulls. Physical shape: one (group, term) partial-agg census —
    shuffle bounded by distinct pairs — then a per-group census and ONE
    global 1-row aggregate; slices with zero tokens are excluded (no
    point, ln undefined)."""
    from .index import col_index_tokens

    census = (
        docs.select(
            F.col(group_col).alias("g"),
            F.explode(col_index_tokens(text_col)).alias("w"),
        )
        .groupBy("g", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    points = census.groupBy("g").agg(
        F.sum("c").alias("n_tok"), F.count(F.lit(1)).alias("v")
    )
    xy = points.select(
        F.log(F.col("n_tok").cast("double")).alias("x"),
        F.log(F.col("v").cast("double")).alias("y"),
    )
    agg = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    dx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    # degeneracy guards are RELATIVE (dx is the catastrophic cancellation
    # n·Σx² − (Σx)²: with a constant-x slice it lands at ±1e-12 depending
    # on summation ORDER, so a bare `> 0` flips nondeterministically
    # between engines/partitionings and can emit a garbage 0/0-shaped r²;
    # a 1e-9 relative floor reads the same verdict on every engine)
    dx_ok = dx > F.lit(1e-9) * n * F.col("sxx")
    dy_ok = dy > F.lit(1e-9) * n * F.col("syy")
    beta = F.when((n >= 2) & dx_ok, cov / dx)
    return agg.select(
        n.cast("long").alias("n_points"),
        F.round(beta, 6).alias("beta_r"),
        F.round(
            F.when(beta.isNotNull(), (F.col("sy") - beta * F.col("sx")) / n),
            6,
        ).alias("lnk_r"),
        F.round(
            F.when(beta.isNotNull() & dy_ok, (cov * cov) / (dx * dy)),
            6,
        ).alias("r2_r"),
    )


def vocab_richness(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Nonparametric vocabulary-richness estimation per corpus slice —
    the sampling-theory companion to `heaps_fit`'s parametric growth
    curve (Good 1953 population-frequency estimation; Chao 1984
    species-richness lower bound, bias-corrected form):

    - ``unseen_mass`` = f1/N — the Good-Turing probability that the
      NEXT token drawn from this slice is a type never seen before;
    - ``coverage`` = 1 − f1/N — Good's sample-coverage estimator (how
      much of the slice's true type distribution the crawl has already
      captured);
    - ``chao1`` = V + f1(f1−1)/(2(f2+1)) — estimated TRUE type count,
      finite even when no type occurs exactly twice.

    The crawl reading: a source whose unseen_mass stays high after N
    tokens still yields novel vocabulary (keep crawling it — the
    frontier-scheduling signal beside recrawl's change-rate λ̂); one
    whose coverage saturates is templated or exhausted. chao1/V is the
    vocabulary headroom a dictionary-sizing plan (heaps_fit's k·N^β)
    can be sanity-checked against.

    Physical shape: one (group, term) partial-agg census — shuffle
    bounded by distinct pairs, never corpus rows — then one per-group
    aggregate over census rows. Slices with zero tokens emit no row
    (nothing sampled, nothing estimable). SQL-replayable end-to-end."""
    from .index import col_index_tokens

    census = (
        docs.select(
            F.col(group_col).alias(group_col),
            F.explode(col_index_tokens(text_col)).alias("w"),
        )
        .groupBy(group_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = census.groupBy(group_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("v_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    return agg.select(
        group_col,
        "n_tokens",
        "v_types",
        "f1",
        "f2",
        F.round(
            F.col("v_types") + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 6
        ).alias("chao1_r"),
        F.round(f1 / F.col("n_tokens"), 6).alias("unseen_mass_r"),
        F.round(1.0 - f1 / F.col("n_tokens"), 6).alias("coverage_r"),
    )


#: Parked-domain phrase alternation — ASCII literals, (?i) + \b only, so
#: the ORACLE INLINES THIS EXACT STRING (the SOFT404_RE discipline).
#: Parking lander boilerplate per the registrar/aftermarket ecosystem
#: (Sedo/GoDaddy/Bodis-style templates); Vissers et al., "Parking
#: Sensors" (NDSS'15) document the family.
PARKED_RE = (
    r"(?i)\b(this domain (is|may be) for sale|buy this domain"
    r"|domain (is )?parked|parked free|domain parking"
    r"|related searches|sponsored listings"
    r"|this (web ?page|domain) was parked|renew(ing)? this domain"
    r"|interested in this domain)\b"
)

#: Parking landers are near-empty behind the template; at/below this
#: many tokens a phrase hit is certain, and tiny alone is only an audit
#: signal (mirrors SOFT404_TINY_TOKENS).
PARKED_TINY_TOKENS = 40


def parked_domain_flags(
    pages: DataFrame,
    text_col: str = "text",
    tiny_tokens: int = PARKED_TINY_TOKENS,
) -> DataFrame:
    """Parked/for-sale lander detection — the OTHER 200-that-isn't-content
    page class next to `soft404_flags`: registrar parking templates,
    aftermarket for-sale landers, ad-grid 'related searches' pages. A
    crawler drops them from the corpus AND distrusts their outlinks
    (parking ad grids are link spam by construction), and a frontier
    should down-prioritize the whole host (`host_reputation` composes).

    Emits per-signal columns + the verdict: ``parked_phrase`` (phrase
    anywhere — parking templates ARE the whole page, no head-window
    needed, unlike soft-404 quoting), ``suspect_tiny`` (≤ tiny_tokens),
    and ``parked`` = phrase AND tiny — both signals required, so a news
    article ABOUT domain parking (long) or a legitimately terse landing
    page (no phrase) survives. Pure codegen projection, no shuffle."""
    body = F.coalesce(
        F.col(text_col) if isinstance(text_col, str) else text_col, F.lit("")
    )
    n_tokens = F.size(
        F.filter(F.split(F.trim(body), r"\s+"), lambda t: t != "")
    )
    phrase = body.rlike(PARKED_RE)
    return (
        pages.withColumn("parked_phrase", phrase)
        .withColumn("suspect_tiny", n_tokens <= F.lit(int(tiny_tokens)))
        .withColumn(
            "parked", F.col("parked_phrase") & F.col("suspect_tiny")
        )
    )


def compression_ratio(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the gibberish/repetition
    signal production curation stacks compute next to the Gopher rules
    (RefinedWeb and Dolma both ship a compression-ratio filter): highly
    REPETITIVE text compresses far below normal prose (templated spam,
    keyword stuffing — ratios ≪ prose), while random-looking byte soup
    barely compresses at all (binary-in-text, encoding damage — ratios
    ≈ 1). Natural language sits in a stable band between the extremes,
    so both tails are drop candidates.

    Returns (id, n_bytes, n_compressed, ratio_r) with ratio =
    compressed/raw over UTF-8 bytes, rounded 6; empty/null docs get
    ratio null (no bytes, no signal). zlib at fixed ``level`` is fully
    deterministic for a given input, so results are rerun- and
    partitioning-stable.

    Physical shape: one Arrow-batched pandas UDF over the text column —
    compression is inherently bytewise CPU work no Catalyst expression
    covers; the UDF emits two ints per doc (never the compressed
    payload), so the shuffle cost is the projection's, not the
    corpus'."""
    import pandas as pd
    import zlib

    lvl = int(level)

    @F.pandas_udf("struct<n_bytes: long, n_compressed: long>")
    def comp(texts: pd.Series) -> pd.DataFrame:
        raw, packed = [], []
        for t in texts:
            b = (t or "").encode("utf-8")
            raw.append(len(b))
            packed.append(len(zlib.compress(b, lvl)) if b else 0)
        return pd.DataFrame({"n_bytes": raw, "n_compressed": packed})

    out = docs.select(
        F.col(id_col).alias("id"), comp(F.col(text_col)).alias("c")
    )
    return out.select(
        "id",
        F.col("c.n_bytes").alias("n_bytes"),
        F.col("c.n_compressed").alias("n_compressed"),
        F.round(
            F.when(
                F.col("c.n_bytes") > 0,
                F.col("c.n_compressed") / F.col("c.n_bytes"),
            ),
            6,
        ).alias("ratio_r"),
    )


def char_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 1000,
) -> DataFrame:
    """Shannon entropy of the character distribution over the first
    ``max_chars`` chars — the distribution-shape gibberish signal next
    to `compression_ratio`'s redundancy view: natural prose sits ~3.5-4.5
    bits/char; base64/hex blobs and encrypted junk push toward the
    uniform ceiling, single-char runs and template filler collapse
    toward 0. Both tails are drop candidates, and unlike zlib this one
    is pure Catalyst (oracle-replayable) and order-free.

    Returns (id, n_chars, entropy_r): H = −Σ p_c·log2(p_c), rounded 6;
    empty/null docs → null entropy. Per-row cost O(distinct_chars ·
    length) with both factors capped (charset ≤ ~100 for text, length
    by ``max_chars``) — a map-only projection, no shuffle, no UDF; the
    prefix cap is the langid max_chars argument: the distribution is
    decidable from a head sample."""
    if max_chars < 1:
        raise ValueError("max_chars must be >= 1")
    head = F.substring(
        F.coalesce(F.col(text_col), F.lit("")), 1, int(max_chars)
    )
    chars = F.split(head, "")
    chars = F.filter(chars, lambda c: c != "")
    n = F.size(chars)
    terms = F.transform(
        F.array_distinct(chars),
        lambda c: F.size(F.filter(chars, lambda x: x == c)) / n,
    )
    h = -F.aggregate(
        terms,
        F.lit(0.0),
        lambda acc, p: acc + p * F.log2(p),
    )
    return docs.select(
        F.col(id_col).alias("id"),
        n.alias("n_chars"),
        F.round(F.when(n > 0, h), 6).alias("entropy_r"),
    )


# code-line cues — ALL RE2-safe (no backreferences), shared verbatim with
# the DuckDB oracle. Deliberately high-precision, low-recall per line:
# the DOCUMENT-level fraction is the signal.
CODE_LINE_RES = [
    r"[{};]\s*$",                     # brace/semicolon line ends
    r"^(    |\t)",                    # indented block
    r"^\s*(def |class |import |from |function |var |let |const |return\b)",
    r"=>|==|!=|&&|\|\||::|</?[a-z]+>",  # operators / inline markup
]


def code_fraction(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document code-likeness: (id, n_lines, n_code_lines,
    code_frac_r, is_codey).

    Web corpora destined for natural-language training need code either
    ROUTED (to a code mixture bucket) or DOWN-WEIGHTED, and either way
    MEASURED — StarCoder/RedPajama-style pipelines gate on exactly this
    kind of per-line cue census (brace/semicolon line ends, indent
    blocks, keyword heads, operator density). Per-line cues are cheap
    and noisy; the document-level fraction is robust: prose rarely
    sustains >30% cue lines, real code rarely stays under it.

    ``is_codey`` = code_frac ≥ 0.3 with ≥ 3 matching lines (a 2-line doc
    with one brace is not code). Empty/whitespace docs report 0 lines
    and are never codey. Map-only codegen projection (split + filter
    over the line array) — no UDF, no shuffle."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(c, "\n"), lambda x: F.trim(x) != "")
    is_code = lambda x: (  # noqa: E731
        x.rlike(CODE_LINE_RES[0])
        | x.rlike(CODE_LINE_RES[1])
        | x.rlike(CODE_LINE_RES[2])
        | x.rlike(CODE_LINE_RES[3])
    )
    n_code = F.size(F.filter(lines, is_code))
    n_lines = F.size(lines)
    frac = F.when(n_lines > 0, n_code / n_lines).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col).alias("id"),
        n_lines.alias("n_lines"),
        n_code.alias("n_code_lines"),
        F.round(frac, 6).alias("code_frac_r"),
        ((frac >= 0.3) & (n_code >= 3)).alias("is_codey"),
    )
