"""Sharded bloom-filter accelerator for the URL-seen check.

The exact ``left_anti`` against the cumulative url_seen table is the
correctness ground truth (frontier.extract_new_links). At 10^10-URL scale
that anti-join shuffles every candidate link against the full seen set every
tick; the bloom pre-filter cuts it: candidates that are *definitely new*
(bloom miss) skip the anti-join entirely, and only the maybe-seen residue —
a small fraction when most links are fresh — pays the exact check. Bloom
false positives therefore cost only wasted exact checks, never correctness;
false negatives are impossible (tested).

Shards are keyed by ``pmod(url_hash, num_shards)`` so each shard's bitset is
built and probed co-partitioned — the same partitioning discipline as the
frontier — and checkpointed as one ``(shard, bits)`` row per shard.
Bit positions use double hashing from the two 32-bit halves of the xxhash64
url_hash (Kirsch-Mitzenmacher), all vectorized in numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_SCHEMA = "shard int, bits binary"


def _positions(hashes: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """(n,) int64 url_hashes → (k, n) bit positions via double hashing."""
    u = hashes.astype(np.uint64)
    h1 = (u & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = ((u >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)
    ks = np.arange(num_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + ks * h2[None, :]) % np.uint64(num_bits)).astype(np.int64)


def build_bloom_shards(
    seen: DataFrame, num_shards: int = 64, bits_per_shard: int = 1 << 20, num_hashes: int = 5
) -> DataFrame:
    """url_seen(url_hash, ...) → one (shard, bits) row per shard."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        bits = np.zeros(bits_per_shard // 8, dtype=np.uint8)
        pos = _positions(pdf["url_hash"].to_numpy(np.int64), bits_per_shard, num_hashes)
        np.bitwise_or.at(bits, pos.ravel() >> 3, np.uint8(1) << (pos.ravel() & 7).astype(np.uint8))
        return pd.DataFrame({"shard": [shard], "bits": [bits.tobytes()]})

    return (
        seen.withColumn("shard", F.pmod(F.col("url_hash"), F.lit(num_shards)).cast("int"))
        .groupBy("shard")
        .applyInPandas(build, BLOOM_SCHEMA)
    )


def _probe_blob(blob: bytes, arr: np.ndarray, num_hashes: int) -> np.ndarray:
    """Vectorized membership test of int64 hashes against one shard bitset.
    Geometry derives from the blob's length, so resized filters probe
    correctly whatever ``bits_per_shard`` the builder used."""
    bitarr = np.frombuffer(blob, dtype=np.uint8)
    pos = _positions(arr, len(bitarr) * 8, num_hashes)
    hit = np.ones(len(arr), dtype=bool)
    for k in range(num_hashes):
        hit &= (bitarr[pos[k] >> 3] & (np.uint8(1) << (pos[k] & 7).astype(np.uint8))) != 0
    return hit


def probe_maybe_seen(
    candidates: DataFrame,
    bloom: DataFrame,
    num_shards: int = 64,
    bits_per_shard: int = 1 << 20,
    num_hashes: int = 5,
    mode: str = "sharded",
    salts: int = 4,
    track: bool = False,
) -> DataFrame:
    """Candidates with a boolean ``__maybe_seen`` column from probing the
    shard bitsets, vectorized per Arrow batch — the single-pass primitive
    (consumers read the flag once; splitting into two frames re-executes
    the probe per branch, see ``shardprobe.split_sharded``).

    ``mode="sharded"`` (the default, and the 10^10-URL shape): candidates
    cogroup with the ``(shard, bits)`` table on ``(pmod(url_hash,
    num_shards), salt)``, so each task ships exactly ONE shard's bitset
    (``bits_per_shard/8`` bytes) and no process — driver included — ever
    materializes the whole filter. See ``shardprobe`` for the full cost
    model and the blob/row-side guards.

    ``mode="broadcast"`` (round-4 shape, for small filters): the whole
    filter is collected and rides a task-level broadcast variable;
    per-row payload is the 8-byte hash but every executor holds the FULL
    filter — fine at MiBs, absurd at the ~10 GiB a 10^10-URL filter
    needs. Null-hash rows are split off at the PLAN level (flag False),
    never inside the UDF: a null inside an Arrow batch converts the whole
    int64 column to float64, silently corrupting hashes beyond 2^53 —
    the UDF asserts a true int64 arrival. Pass ``track=True`` only from a
    scope that calls ``shardprobe.release_probe_broadcasts()`` after its
    actions (the crawler tick); untracked broadcasts reclaim via GC +
    ContextCleaner as before round 5.

    Never a broadcast JOIN: that attached the blob to every candidate row
    (1 MiB/row at 2^23-bit shards — tens of GB of DiskRowQueue spill in
    the 10M-page stress), asserted against by the plan tripwire.
    """
    from . import shardprobe

    shardprobe.check_shard_geometry(bits_per_shard // 8, num_shards, "bloom config")
    if mode == "sharded":
        return shardprobe.probe_sharded(
            candidates,
            bloom.withColumnRenamed("bits", "__blob"),
            "__blob",
            num_shards,
            lambda blob, arr: _probe_blob(blob, arr, num_hashes),
            salts=salts,
        )
    if mode != "broadcast":
        raise ValueError(f"unknown bloom probe mode: {mode!r}")

    shard_bits = {int(r["shard"]): bytes(r["bits"]) for r in bloom.collect()}
    bc = candidates.sparkSession.sparkContext.broadcast(shard_bits)
    if track:
        shardprobe.track_broadcast(bc)

    @F.pandas_udf("boolean")
    def probe(hashes: pd.Series) -> pd.Series:
        if len(hashes) == 0:
            return pd.Series(np.zeros(0, dtype=bool))
        if hashes.dtype.kind not in "iu":  # see probe_maybe_seen docstring
            raise AssertionError(
                f"bloom probe received url_hash as {hashes.dtype} (expected "
                "int64) — null rows must be split off before the UDF"
            )
        arr = hashes.to_numpy(np.int64)
        # numpy % matches F.pmod for a positive divisor (sign of divisor)
        shards = arr % np.int64(num_shards)
        out = np.zeros(len(arr), dtype=bool)
        blobs = bc.value
        for s in np.unique(shards):
            blob = blobs.get(int(s))
            if blob is None:
                continue
            mask = shards == s
            out[mask] = _probe_blob(blob, arr[mask], num_hashes)
        return pd.Series(out)

    flag = shardprobe.FLAG
    nulls = candidates.filter(F.col("url_hash").isNull()).withColumn(
        flag, F.lit(False)
    )
    probed = candidates.filter(F.col("url_hash").isNotNull()).withColumn(
        flag, probe(F.col("url_hash"))
    )
    return probed.unionByName(nulls)


def split_by_bloom(
    candidates: DataFrame,
    bloom: DataFrame,
    num_shards: int = 64,
    bits_per_shard: int = 1 << 20,
    num_hashes: int = 5,
    mode: str = "sharded",
    salts: int = 4,
    track: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) view over ``probe_maybe_seen`` — two
    consumers of one lazy plan (evaluating both re-runs the probe unless
    persisted; the unseen-filter consumes the flag once instead)."""
    from .shardprobe import FLAG

    probed = probe_maybe_seen(
        candidates, bloom, num_shards, bits_per_shard, num_hashes, mode, salts, track
    )
    return probed.filter(~F.col(FLAG)).drop(FLAG), probed.filter(F.col(FLAG)).drop(FLAG)


def merge_bloom_shards(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two shard sets together (incremental maintenance: tick t's bloom =
    tick t-1's bloom ∪ the seen delta's shards). Executor-side reduce —
    never collects a bitset to the driver."""

    def orr(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        acc = None
        for blob in pdf["bits"]:
            arr = np.frombuffer(blob, dtype=np.uint8)
            acc = arr.copy() if acc is None else np.bitwise_or(acc, arr)
        return pd.DataFrame({"shard": [shard], "bits": [acc.tobytes()]})

    return a.unionByName(b).groupBy("shard").applyInPandas(orr, BLOOM_SCHEMA)


def exact_unseen(candidates: DataFrame, seen: DataFrame) -> DataFrame:
    """The exact unseen backstop shared by the bloom and cuckoo
    accelerators: anti-join on (url_hash, fp128) — hash for shuffle
    locality, a 128-bit md5 fingerprint for equality (computed in
    projection, so the shuffle ships 24 B/row, not the url string) — a
    64-bit hash collision between a new URL and a seen one costs only a
    wasted maybe-hit, never a dropped URL. Accelerator probes stay
    hash-only (a colliding new URL lands in ``maybe_seen`` and survives
    this exact check)."""
    from .udfs import col_url_fp128

    fp = col_url_fp128(F.col("url_canon"))
    seen_keys = seen.select("url_hash", fp.alias("url_fp"))
    return (
        candidates.withColumn("url_fp", fp)
        .join(seen_keys, ["url_hash", "url_fp"], "left_anti")
        .drop("url_fp")
    )


def filter_unseen_with_bloom(
    candidates: DataFrame, seen: DataFrame, bloom: DataFrame | None, **bloom_kw
) -> DataFrame:
    """Exact unseen-filter accelerated by the bloom prefilter when given.
    Result is identical to the plain left_anti (tested in test_bloom.py);
    see ``exact_unseen`` for the identity rationale.

    Single-probe shape: the flagged frame is persisted (and registered
    for the same scope-owned release as the probe broadcasts), so the two
    split branches evaluate the probe and its candidate exchange ONCE —
    the earlier unpersisted split re-executed them per branch. The
    maybe-seen residue alone feeds the exact anti-join: keeping the
    definitely-new majority OUT of the join is what lets AQE broadcast a
    small residue and skip the seen-side exchange entirely — the bloom's
    actual 10^10-scale payoff."""
    from pyspark import StorageLevel

    from . import shardprobe
    from .shardprobe import FLAG

    if bloom is None:
        return exact_unseen(candidates, seen)
    probed = probe_maybe_seen(candidates, bloom, **bloom_kw).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if bloom_kw.get("track"):  # scope-owned release (crawler tick); else LRU
        shardprobe.track_cache(probed)
    new = probed.filter(~F.col(FLAG)).drop(FLAG)
    maybe = probed.filter(F.col(FLAG)).drop(FLAG)
    return new.unionByName(exact_unseen(maybe, seen))
