"""Distributed unigram-LM tokenizer (SentencePiece-style) training + encoding.

The OTHER modern subword tokenizer next to BPE (`operators/bpe.py`):
Kudo, ACL 2018 ("Subword Regularization") trains a unigram language
model over a seed vocabulary of candidate pieces and prunes it down —
where BPE grows a vocabulary bottom-up by merging, unigram starts big
and shrinks, and its probabilistic segmentation is what SentencePiece
ships as the default for T5/ALBERT/XLNet-family models.

Spark shape (the BPE discipline, restated for EM):

- **The corpus is touched exactly once** — a word census (word → count),
  one partial-agg shuffle; everything after runs on the census table,
  vocabulary-bound, not corpus-bound.
- **Seed vocabulary** = the top ``seed_size`` substrings (length ≤
  ``max_piece_len``) of census words by corpus frequency, plus ALL
  single characters (guarantees every word stays segmentable — Kudo's
  "character coverage" invariant). Substring explosion is pure Catalyst
  (sequence/transform/flatten) over distinct words.
- **EM**: the E-step runs the per-word forward-backward over the census
  with the piece table broadcast via closure (pieces ≤ seed_size — a
  few thousand rows, the langid-model broadcast shape), emitting
  (piece, expected_count·word_freq) rows; one partial-agg groupBy
  M-steps the probabilities. The collect per round is the piece table
  (vocab-bounded), mirroring train_bpe's single-row argmax collect.
- **Prune** after each round: keep single chars + the top pieces by
  (prob rounded to 12, piece) — the rounding keeps the ranking stable
  under float summation-order noise — shrinking by ``keep_frac`` per
  round toward ``vocab_size`` (simplified from Kudo's loss-delta prune;
  documented divergence, same monotone-shrink shape).
- **Viterbi encode** scores with log-probs ROUNDED to 9 decimals and a
  fixed tie-break (fewer pieces, then longer final piece), so the
  segmentation is deterministic across engines, runs, and partitionings;
  per-word results are cached per batch (the BPE encode cache).

Correctness is pinned by a pure-Python reference in
`tests/test_unigram.py` — identical piece sets, probabilities within
float-summation tolerance, IDENTICAL encodings (the LSH/BPE
differential discipline for iteration a DuckDB oracle can't express).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_SCHEMA = "word string, count bigint"


def word_census(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → (word, count); lowercase, whitespace split — the BPE
    pre-tokenization convention."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda t: t != "",
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def seed_pieces(
    census: DataFrame, seed_size: int, max_piece_len: int = 8
) -> DataFrame:
    """(piece, cnt): the top ``seed_size`` substrings of census words by
    corpus frequency ∪ every single character. Substring explosion is
    Catalyst-only and census-bounded: a length-L word contributes ≤
    L·max_piece_len (start, len) substrings."""
    w = F.col("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.length(w) - 1),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), F.length(w) - i)
                ),
                lambda l: w.substr(i + 1, l),
            ),
        )
    )
    pieces = (
        census.select(F.explode(subs).alias("piece"), "count")
        .groupBy("piece")
        .agg(F.sum("count").alias("cnt"))
        .persist()
    )
    top = pieces.orderBy(F.desc("cnt"), F.asc("piece")).limit(int(seed_size))
    chars = pieces.filter(F.length("piece") == 1)
    out = top.unionByName(chars).groupBy("piece").agg(F.max("cnt").alias("cnt"))
    out = out.localCheckpoint(eager=True)
    pieces.unpersist()
    return out


def _estep_udf(probs: dict[str, float], max_piece_len: int):
    """mapInPandas factory: census (word, count) batches → (piece, exp)
    expected-count rows under the current unigram probs (forward-backward
    per word, weighted by word frequency)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[str, float] = {}
        for pdf in batches:
            for word, cnt in zip(pdf["word"], pdf["count"]):
                n = len(word)
                fwd = [0.0] * (n + 1)
                fwd[0] = 1.0
                spans = []  # (start, end, piece, p)
                for e in range(1, n + 1):
                    for s in range(max(0, e - max_piece_len), e):
                        p = probs.get(word[s:e])
                        if p:
                            spans.append((s, e, word[s:e], p))
                            fwd[e] += fwd[s] * p
                if fwd[n] <= 0.0:
                    continue  # unsegmentable under current vocab
                bwd = [0.0] * (n + 1)
                bwd[n] = 1.0
                for s in range(n - 1, -1, -1):
                    for e in range(s + 1, min(n, s + max_piece_len) + 1):
                        p = probs.get(word[s:e])
                        if p:
                            bwd[s] += p * bwd[e]
                z = fwd[n]
                for s, e, piece, p in spans:
                    exp = fwd[s] * p * bwd[e] / z
                    if exp > 0.0:
                        acc[piece] = acc.get(piece, 0.0) + exp * int(cnt)
        yield pd.DataFrame(
            {"piece": list(acc.keys()), "exp": list(acc.values())}
        )

    return run


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 120,
    seed_size: int = 600,
    max_piece_len: int = 8,
    em_iters: int = 3,
    keep_frac: float = 0.75,
    text_col: str = "text",
) -> list[tuple[str, float]]:
    """Train the unigram LM → [(piece, logp)] sorted by piece, logp
    rounded to 9 (the Viterbi scoring precision). Single characters are
    never pruned; each round runs one E-step over the census, one
    M-step, and one rounded-prob prune toward ``vocab_size``."""
    if vocab_size < 1 or seed_size < vocab_size:
        raise ValueError("need seed_size >= vocab_size >= 1")
    spark = docs.sparkSession
    census = word_census(docs, text_col).persist()
    census.count()
    seed = seed_pieces(census, seed_size, max_piece_len)
    rows = seed.collect()
    total = float(sum(r["cnt"] for r in rows))
    probs = {r["piece"]: r["cnt"] / total for r in rows}
    for it in range(em_iters):
        exp_df = (
            census.mapInPandas(
                _estep_udf(probs, max_piece_len), "piece string, exp double"
            )
            .groupBy("piece")
            .agg(F.sum("exp").alias("exp"))
        )
        got = {r["piece"]: r["exp"] for r in exp_df.collect()}
        z = sum(got.values())
        if z <= 0:
            break
        probs = {p: e / z for p, e in got.items()}
        # prune toward vocab_size on the ROUNDED prob (stable under
        # summation-order noise), chars immortal
        n_now = len(probs)
        keep_n = max(int(vocab_size), int(math.ceil(n_now * keep_frac)))
        if it == em_iters - 1:
            keep_n = int(vocab_size)
        ranked = sorted(
            probs.items(), key=lambda kv: (-round(kv[1], 12), kv[0])
        )
        kept = {p: v for p, v in ranked[:keep_n]}
        for p, v in probs.items():
            if len(p) == 1:
                kept[p] = v
        z2 = sum(kept.values())
        probs = {p: v / z2 for p, v in kept.items()}
    census.unpersist()
    return sorted((p, round(math.log(v), 9)) for p, v in probs.items())


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int = 8,
    unk_logp: float = -100.0,
) -> list[str]:
    """Best segmentation under the unigram LM: maximize Σ logp with the
    fixed tie-break (fewer pieces, then longer final piece). Characters
    absent from the vocab score ``unk_logp`` as single-char pieces so
    encoding never fails on unseen text. Deterministic: logp values are
    pre-rounded to 9 decimals and the DP is a fixed left-to-right scan."""
    n = len(word)
    # dp: (score, n_pieces_negated_for_max?) — store (score, -pieces) and
    # pick lexicographically largest; back[e] = chosen start
    NEG = float("-inf")
    dp = [(NEG, 0)] * (n + 1)
    dp[0] = (0.0, 0)
    back = [0] * (n + 1)
    for e in range(1, n + 1):
        best = (NEG, 0)
        bs = e - 1
        for s in range(max(0, e - max_piece_len), e):
            if dp[s][0] == NEG:
                continue
            piece = word[s:e]
            lp = logp.get(piece)
            if lp is None:
                if e - s == 1:
                    lp = unk_logp
                else:
                    continue
            cand = (dp[s][0] + lp, dp[s][1] - 1)
            # tie-break: higher score, then fewer pieces, then SMALLER s
            # (longer final piece)
            if cand > best or (cand == best and s < bs):
                best, bs = cand, s
        dp[e] = best
        back[e] = bs
    out = []
    e = n
    while e > 0:
        s = back[e]
        out.append(word[s:e])
        e = s
    return list(reversed(out))


def encode_unigram(
    docs: DataFrame,
    pieces: list[tuple[str, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """Encode documents with a trained piece table → (id, n_words,
    n_tokens, tokens_per_word) — the same QA surface as
    `bpe.encode_with_merges`, so the two tokenizers are directly
    comparable (tokenizer-fertility style). Vectorized pandas UDF per
    word with a per-batch word cache."""
    logp = {p: lp for p, lp in pieces}

    @F.pandas_udf("int")
    def count_tokens(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}
        out = []
        for t in texts:
            total = 0
            for w in (t or "").lower().strip().split():
                if w not in cache:
                    cache[w] = len(viterbi_segment(w, logp, max_piece_len))
                total += cache[w]
            out.append(total)
        return pd.Series(out, dtype="int32")

    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda t: t != "",
    )
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("int").alias("n_words"),
        count_tokens(F.col(text_col)).alias("n_tokens"),
    ).withColumn(
        "tokens_per_word",
        F.round(
            F.when(
                F.col("n_words") > 0, F.col("n_tokens") / F.col("n_words")
            ).otherwise(0.0),
            4,
        ),
    )
