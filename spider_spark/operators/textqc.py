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
