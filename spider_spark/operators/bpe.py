"""Distributed BPE tokenizer training + encoding.

Byte-Pair Encoding (Sennrich et al. 2016, ACL — the tokenizer family GPT/
Llama vocabularies descend from) trained as Spark jobs:

- **The corpus is touched exactly once.** Training starts with a word
  census (word → count): one partial-agg shuffle over the documents. All
  subsequent work runs on the census table (distinct words), whose size is
  corpus-vocabulary-bound, NOT corpus-bound — the shape that makes BPE
  trainable over 100 TB of text (the census for a web-scale corpus is
  millions of rows, not trillions).
- **One merge per sweep, driver picks the argmax.** Each iteration
  explodes the census's adjacent symbol pairs weighted by word count,
  partial-aggs pair counts, and collects only the single best pair
  (ties broken lexicographically — deterministic across partitionings).
  Applying the merge rewrites the symbol arrays with a vectorized pandas
  UDF over the census (again vocabulary-bound).
- **Lineage is cut** with localCheckpoint every few sweeps (the
  pointer-doubling discipline from `operators/graph.py`) so a 1000-merge
  training run doesn't accumulate a 1000-deep plan.

Correctness is pinned by a pure-Python reference implementation in the
tests (`tests/test_bpe.py`): identical merge tables and identical
encodings on the same corpus — the differential discipline the repo uses
wherever a DuckDB oracle can't express iteration (LSH, PageRank beyond 2
unrolled steps).

Word pre-tokenization matches the repo's token convention (lowercase,
split on whitespace); each word ends with the ``</w>`` marker so merges
can't cross word boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"

CENSUS_SCHEMA = "word string, count bigint, syms array<string>"


def word_census(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → (word, count, syms) where syms is the initial
    character-level symbol sequence with the ``</w>`` terminator."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != "")
    census = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
    return census.select("word", "count", syms.alias("syms"))


def _pair_counts(census: DataFrame) -> DataFrame:
    """(word, count, syms) → (left, right, pair_count) over adjacent
    symbol pairs, weighted by word count. Within-word duplicate pairs
    count once per occurrence position (the standard BPE statistic)."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("syms") - 2),
            lambda i: F.struct(
                F.element_at("syms", i + 1).alias("left"),
                F.element_at("syms", i + 2).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    return (
        census.select("count", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("count").alias("pair_count"))
    )


def _apply_merge_udf(left: str, right: str):
    """Vectorized merge application: replace every adjacent (left, right)
    in each symbol array with the concatenation, left-to-right greedy
    (after a merge the new symbol can immediately pair with the next —
    standard BPE semantics, e.g. merging ('a','a') on 'aaa' yields
    ['aa','a'])."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        merged = left + right
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                res = []
                i = 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            pdf = pdf.copy()
            pdf["syms"] = out
            yield pdf

    return run


def train_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges → ordered [(left, right, pair_count)].

    Stops early when no pair occurs ≥ 2 times (nothing left to compress).
    Ties on pair_count break lexicographically on (left, right) so the
    merge table is independent of partitioning/parallelism."""
    return _train_on_census(word_census(docs, text_col), num_merges, checkpoint_every)


def _train_on_census(
    census: DataFrame, num_merges: int, checkpoint_every: int = 8
) -> list[tuple[str, str, int]]:
    """The sweep loop shared by the word-level and byte-level trainers:
    census (word, count, syms) → ordered [(left, right, pair_count)]."""
    census = census.persist()
    census.count()  # materialize once; corpus is never read again
    merges: list[tuple[str, str, int]] = []
    for step in range(num_merges):
        best = (
            _pair_counts(census)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0].pair_count < 2:
            break
        left, right, cnt = best[0].left, best[0].right, int(best[0].pair_count)
        merges.append((left, right, cnt))
        prev = census
        census = census.mapInPandas(_apply_merge_udf(left, right), CENSUS_SCHEMA).persist()
        if (step + 1) % checkpoint_every == 0:
            census = census.localCheckpoint()  # cut the per-sweep lineage
        census.count()
        prev.unpersist()
    census.unpersist()
    return merges


def encode_with_merges(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents with a learned merge table → (id, n_words,
    n_tokens, tokens_per_word). Standard rank-greedy BPE encode: apply
    the LOWEST-rank applicable merge repeatedly until none applies —
    vectorized pandas UDF per word, merge ranks broadcast via closure."""
    ranks = {(m[0], m[1]): r for r, m in enumerate(merges)}

    def encode_word(word: str) -> int:
        syms = list(word) + [END]
        while len(syms) >= 2:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return len(syms)

    @F.pandas_udf("int")
    def count_tokens(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}
        out = []
        for t in texts:
            total = 0
            for w in (t or "").lower().strip().split():
                if w not in cache:
                    cache[w] = encode_word(w)
                total += cache[w]
            out.append(total)
        return pd.Series(out, dtype="int32")

    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != "")
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("int").alias("n_words"),
        count_tokens(F.col(text_col)).alias("n_tokens"),
    ).withColumn(
        "tokens_per_word",
        F.round(
            F.when(F.col("n_words") > 0, F.col("n_tokens") / F.col("n_words")).otherwise(0.0), 4
        ),
    )


# ---------------------------------------------------------------------------
# Byte-level BPE, GPT-2 style (Radford et al. 2019; the public
# openai/gpt-2 encoder: regex pre-tokenizer + bytes→unicode remap + BPE
# over the remapped bytes, no ``</w>`` marker) — the tokenizer family real
# web-text training pipelines actually run. Same distributed shape as the
# word-level trainer above: one corpus pass builds a PRE-TOKEN census,
# every sweep runs on the vocabulary-bounded census table.

# The published GPT-2 split pattern, verbatim (contractions, space-glued
# letter/number/punct runs, and the backtracking ``\s+(?!\S)`` branch that
# makes a mid-text whitespace run yield all-but-its-last space so the last
# space attaches to the following token).
GPT2_SPLIT_PATTERN = (
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


def gpt2_bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte→unicode remap: the 188 printable/latin bytes
    map to themselves; the rest map to 256+n in first-gap order, making
    every byte a printable character so BPE runs on strings (space 0x20 →
    'Ġ' U+0120, newline 0x0A → 'Ċ' U+010A). Bijective — tested."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _gpt2_splitter():
    """Compiled GPT-2 pre-tokenizer. Needs the ``regex`` module for the
    ``\\p{L}``/``\\p{N}`` classes; import-gated like every optional dep."""
    import regex  # noqa: F401 — \p classes + backtracking lookahead

    return regex.compile(GPT2_SPLIT_PATTERN)


def gpt2_pretokenize(text: str) -> list[str]:
    """text → GPT-2 pre-tokens (exact published semantics)."""
    return _gpt2_splitter().findall(text or "")


def gpt2_pretoken_census(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → (word, count, syms) census over byte-remapped GPT-2
    pre-tokens — ``word`` is the REMAPPED pre-token (so census keys are
    printable and the downstream sweep machinery applies unchanged),
    ``syms`` its initial per-byte symbol sequence. No ``</w>``: byte-level
    BPE bounds merges by the pre-tokenizer instead of an end marker."""
    byte_map = gpt2_bytes_to_unicode()

    def split_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pat = _gpt2_splitter()
        for pdf in batches:
            counts: dict[str, int] = {}
            for t in pdf[text_col]:
                for tok in pat.findall(t or ""):
                    mapped = "".join(byte_map[b] for b in tok.encode("utf-8"))
                    counts[mapped] = counts.get(mapped, 0) + 1
            yield pd.DataFrame(
                {"word": list(counts.keys()), "count": list(counts.values())}
            )

    partial = docs.select(text_col).mapInPandas(split_batches, "word string, count bigint")
    census = partial.groupBy("word").agg(F.sum("count").alias("count"))
    return census.select(
        "word", "count", F.split(F.col("word"), "").alias("syms")
    )


def train_bpe_bytes(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` byte-level merges over GPT-2 pre-tokens →
    ordered [(left, right, pair_count)] in remapped-byte space. Same
    determinism contract as ``train_bpe`` (count desc, then lexicographic
    — partitioning/parallelism independent)."""
    return _train_on_census(
        gpt2_pretoken_census(docs, text_col), num_merges, checkpoint_every
    )


def encode_gpt2(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents with a byte-level merge table → (id, n_pretoks,
    n_tokens, tokens_per_pretok). Rank-greedy BPE per unique pre-token
    (lowest-rank applicable merge first — the published GPT-2 encode
    order), merge ranks broadcast via closure, per-batch memoization on
    the remapped pre-token."""
    ranks = {(m[0], m[1]): r for r, m in enumerate(merges)}
    byte_map = gpt2_bytes_to_unicode()

    def encode_pretoken(mapped: str) -> int:
        syms = list(mapped)
        while len(syms) >= 2:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return len(syms)

    @F.pandas_udf("struct<n_pretoks: int, n_tokens: int>")
    def count_tokens(texts: pd.Series) -> pd.DataFrame:
        pat = _gpt2_splitter()
        cache: dict[str, int] = {}
        n_pre, n_tok = [], []
        for t in texts:
            pre = pat.findall(t or "")
            total = 0
            for tok in pre:
                mapped = "".join(byte_map[b] for b in tok.encode("utf-8"))
                if mapped not in cache:
                    cache[mapped] = encode_pretoken(mapped)
                total += cache[mapped]
            n_pre.append(len(pre))
            n_tok.append(total)
        return pd.DataFrame({"n_pretoks": n_pre, "n_tokens": n_tok})

    enc = docs.select(
        F.col(id_col).alias("id"), count_tokens(F.col(text_col)).alias("e")
    )
    return enc.select(
        "id",
        F.col("e.n_pretoks").alias("n_pretoks"),
        F.col("e.n_tokens").alias("n_tokens"),
    ).withColumn(
        "tokens_per_pretok",
        F.round(
            F.when(F.col("n_pretoks") > 0, F.col("n_tokens") / F.col("n_pretoks")).otherwise(
                0.0
            ),
            4,
        ),
    )
