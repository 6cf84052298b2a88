"""Sequence packing + shard export (operators/packing.py).

Concat-and-chunk is checked against a from-scratch Python restatement
(lay the per-shard token stream out literally and cut it); FFD is
checked against a brute-force first-fit reference and its classic
quality bound. Determinism across partitioning is asserted explicitly —
a packer whose output depends on cluster size poisons training-data
reproducibility.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import packing


def _bucket(doc_id, n):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % n


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


SEQ = 10


@pytest.fixture(scope="module")
def corpus(spark):
    # Lengths straddle every interesting case: 0 (dropped after +sep
    # only if sep=0), exactly L-1 (fills a chunk with its separator),
    # longer than L (spans chunks), equal sizes (FFD probe fast path).
    rows = [(i, (i * 7) % 23) for i in range(1, 101)]
    return _docs(spark, rows)


def _reference_chunks(rows, seq_len, n_shards, sep):
    """Literal restatement: build each shard's token stream doc by doc,
    then read off which chunk every content token lands in."""
    out = []
    shards = {}
    for doc_id, w in sorted(rows):
        shards.setdefault(_bucket(doc_id, n_shards), []).append((doc_id, w))
    for shard, docs in shards.items():
        pos = 0
        for doc_id, n_tok in docs:
            w = n_tok + sep
            if w <= 0:
                continue
            start, end = pos, pos + w
            pos = end
            for chunk in range(start // seq_len, (end - 1) // seq_len + 1):
                pb = max(start, chunk * seq_len)
                pe = min(end, (chunk + 1) * seq_len)
                content_end = min(pe, start + n_tok)
                out.append(
                    (
                        shard,
                        chunk,
                        doc_id,
                        pb - start,
                        pb - chunk * seq_len,
                        max(content_end - pb, 0),
                    )
                )
    return sorted(out)


def test_concat_chunks_matches_literal_restatement(spark, corpus):
    got = packing.pack_concat_chunks(corpus, SEQ, n_shards=4)
    rows = sorted(tuple(r) for r in got.collect())
    want = _reference_chunks(
        [(r.doc_id, r.n_tokens) for r in corpus.collect()], SEQ, 4, sep=1
    )
    assert rows == [tuple(r) for r in want]


def test_concat_chunks_every_token_exactly_once(spark, corpus):
    """Each doc's content tokens are covered exactly once across its
    pieces, contiguously from offset 0."""
    got = packing.pack_concat_chunks(corpus, SEQ, n_shards=4)
    per_doc = (
        got.groupBy("doc_id")
        .agg(
            F.sum("piece_len").alias("covered"),
            F.min(F.col("doc_offset")).alias("first"),
        )
        .join(corpus, "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        assert r.covered == r.n_tokens, r
        assert r.first == 0


def test_concat_chunks_no_overflow_and_dense_chunks(spark, corpus):
    """No chunk holds more than seq_len tokens of (content + separator)
    mass, and chunk ids per shard are the dense prefix 0..max."""
    got = packing.pack_concat_chunks(corpus, SEQ, n_shards=4).cache()
    fill = (
        got.groupBy("shard", "chunk")
        .agg(F.sum("piece_len").alias("content"))
        .collect()
    )
    for r in fill:
        assert 0 <= r.content <= SEQ
    per_shard = got.groupBy("shard").agg(
        F.countDistinct("chunk").alias("n"), F.max("chunk").alias("mx")
    )
    for r in per_shard.collect():
        assert r.n == r.mx + 1
    got.unpersist()


def test_concat_chunks_partitioning_invariant(spark, corpus):
    a = packing.pack_concat_chunks(corpus.repartition(1), SEQ, n_shards=4)
    b = packing.pack_concat_chunks(corpus.repartition(13), SEQ, n_shards=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_packing_stats_reconcile(spark, corpus):
    packed = packing.pack_concat_chunks(corpus, SEQ, n_shards=4)
    stats = packing.packing_stats(packed, SEQ).collect()
    total_content = sum(r.content_tokens for r in stats)
    assert total_content == sum(r.n_tokens for r in corpus.collect())
    for r in stats:
        assert r.overhead_tokens == r.n_chunks * SEQ - r.content_tokens
        assert 0 < r.utilization <= 1.0


def _reference_ffd(rows, cap, n_shards):
    bins_by_shard = {}
    out = {}
    for doc_id, w in sorted(
        rows, key=lambda t: (-t[1], t[0])
    ):
        if w <= 0:
            continue
        shard = _bucket(doc_id, n_shards)
        bins = bins_by_shard.setdefault(shard, [])
        if w >= cap:
            out[doc_id] = (shard, len(bins), cap, w > cap)
            bins.append(0)
            continue
        for i, free in enumerate(bins):
            if free >= w:
                bins[i] -= w
                out[doc_id] = (shard, i, w, False)
                break
        else:
            bins.append(cap - w)
            out[doc_id] = (shard, len(bins) - 1, w, False)
    return out


def test_ffd_matches_bruteforce_reference(spark, corpus):
    got = packing.pack_bins_ffd(corpus, SEQ, n_shards=4).collect()
    want = _reference_ffd(
        [(r.doc_id, r.n_tokens) for r in corpus.collect()], SEQ, 4
    )
    assert {r.doc_id: (r.shard, r.bin, r.n_tokens, r.truncated) for r in got} == want


def test_ffd_capacity_respected_and_quality_bound(spark, corpus):
    bins = packing.pack_bins_ffd(corpus, SEQ, n_shards=4).cache()
    fills = bins.where(~F.col("truncated")).groupBy("shard", "bin").agg(
        F.sum("n_tokens").alias("fill")
    )
    assert all(r.fill <= SEQ for r in fills.collect())
    # FFD ≤ (11/9)·OPT + 1; OPT ≥ ceil(total/cap). Assert per shard.
    stats = packing.bin_packing_stats(bins, SEQ).collect()
    for r in stats:
        opt_lb = -(-r.content_tokens // SEQ)
        assert r.n_bins <= (11 * opt_lb) // 9 + 1 + 1
    bins.unpersist()


def test_ffd_partitioning_invariant(spark, corpus):
    a = packing.pack_bins_ffd(corpus.repartition(1), SEQ, n_shards=4)
    b = packing.pack_bins_ffd(corpus.repartition(13), SEQ, n_shards=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ffd_oversize_docs_truncated_alone(spark):
    docs = _docs(spark, [(1, 25), (2, 10), (3, 3)])
    got = {r.doc_id: r for r in packing.pack_bins_ffd(docs, 10, n_shards=1).collect()}
    assert got[1].truncated and got[1].n_tokens == 10
    assert not got[2].truncated and got[2].n_tokens == 10
    # Oversize/full bins accept nothing else.
    assert len({(r.bin) for r in got.values()}) == 3


def test_shard_manifest_detects_any_mutation(spark):
    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(200)], "doc_id long, text string"
    )
    base = {r.shard: r for r in packing.shard_manifest(docs, 8).collect()}
    assert sum(r.doc_count for r in base.values()) == 200

    mutated = docs.withColumn(
        "text", F.when(F.col("doc_id") == 137, F.lit("tampered")).otherwise(F.col("text"))
    )
    mut = {r.shard: r for r in packing.shard_manifest(mutated, 8).collect()}
    changed = [s for s in base if base[s].checksum != mut[s].checksum]
    assert changed == [_bucket(137, 8)]

    dropped = packing.shard_manifest(docs.where("doc_id <> 42"), 8).collect()
    drop = {r.shard: r for r in dropped}
    s42 = _bucket(42, 8)
    assert drop[s42].doc_count == base[s42].doc_count - 1
    assert drop[s42].checksum != base[s42].checksum


def test_manifest_order_independent(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "doc_id long, text string"
    )
    a = sorted(map(tuple, packing.shard_manifest(docs, 4).collect()))
    b = sorted(
        map(tuple, packing.shard_manifest(docs.orderBy(F.desc("doc_id")).repartition(7), 4).collect())
    )
    assert a == b


def test_concat_pack_rejects_bad_seq_len(spark, corpus):
    with pytest.raises(ValueError):
        packing.pack_concat_chunks(corpus, 0)
    with pytest.raises(ValueError):
        packing.pack_bins_ffd(corpus, -1)
