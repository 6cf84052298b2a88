"""Sharded cuckoo-filter accelerator for the URL-seen check.

The north-star design calls for a "sharded bloom/cuckoo URL-seen filter"
(SURVEY.md §2.5): ``bloom.py`` is the append-only variant; this module is
the cuckoo variant (Fan et al., "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT'14 — public paper). Same contract as the bloom: candidates
that probe *definitely new* skip the exact anti-join; maybe-seen residue
pays the exact (url_hash, fp128) check, so false positives cost wasted
exact checks, never correctness, and false negatives are impossible
(tested). What the cuckoo adds over the bloom:

- **deletion** (``delete_from_cuckoo``): a recrawl policy can evict URLs
  from the seen accelerator so they become fetchable again — a bloom
  cannot unset bits;
- bounded, slightly lower false-positive rate at the same memory
  (16-bit fingerprints, 4-slot buckets, ~95 % load).

Sharding/partitioning discipline is identical to ``bloom.py``: shards are
keyed by ``pmod(url_hash, num_shards)`` so each shard's table is built and
probed co-partitioned with the frontier, checkpointed as one
``(shard, table)`` row per shard, and the broadcast into the probe join is
``num_shards`` rows (default geometry: 16 384 buckets × 4 slots × 2 B =
128 KiB/shard — the same footprint as the default bloom shard).

Partial-key cuckoo hashing, all derived from the same ``xxhash64``
url_hash the rest of the engine keys on (no second hash of the URL
string): fingerprint = bits 48-63 (0 remapped to 1; 0 marks an empty
slot), bucket₁ = bits 16-47 mod buckets, bucket₂ = bucket₁ XOR
H(fingerprint) — buckets is a power of two so the XOR is an involution
and either bucket recovers the other. Inserts that still collide after
``max_kicks`` evictions land in a per-shard overflow list keyed by
``(min(bucket₁, bucket₂) << 16) | fp`` — membership stays an exact
superset even when a shard overfills, degrading probe cost linearly
instead of dropping items.

Duplicates are deliberately kept (two URLs whose hashes share a
(bucket, fingerprint) pair occupy two slots, p ≈ 1/(buckets·2¹⁶) per
pair): deleting one member then leaves the other's membership intact.
The standard cuckoo-filter contract applies to deletes: only delete
items that were actually inserted, at most once per insertion.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CUCKOO_SCHEMA = "shard int, table binary"

_HDR = 12  # 3 × uint32: buckets, slots, overflow_count


def _fp_b1(hashes: np.ndarray, buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(n,) int64 url_hashes → (fingerprint uint16 ≠ 0, bucket₁ uint32)."""
    u = hashes.astype(np.uint64)
    fp = ((u >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)
    b1 = ((u >> np.uint64(16)) & np.uint64(buckets - 1)).astype(np.uint32)
    return fp, b1


def _alt_bucket(b: np.ndarray, fp: np.ndarray, buckets: int) -> np.ndarray:
    """bucket₂ = bucket₁ XOR H(fp); involution because buckets is 2^k."""
    h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(buckets - 1)
    return (b.astype(np.uint64) ^ h).astype(np.uint32)


def _canon_key(b: np.ndarray, fp: np.ndarray, buckets: int) -> np.ndarray:
    """Bucket-order-free overflow key: (min(b, alt) << 16) | fp."""
    alt = _alt_bucket(b, fp, buckets)
    lo = np.minimum(b, alt).astype(np.uint64)
    return (lo << np.uint64(16)) | fp.astype(np.uint64)


def _pack(table: np.ndarray, overflow: np.ndarray) -> bytes:
    hdr = np.array([table.shape[0], table.shape[1], len(overflow)], dtype="<u4")
    return hdr.tobytes() + table.astype("<u2").tobytes() + np.asarray(overflow, dtype="<u8").tobytes()


def _unpack(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    hdr = np.frombuffer(blob[:_HDR], dtype="<u4")
    buckets, slots, novf = (int(x) for x in hdr)
    off = _HDR + buckets * slots * 2
    table = np.frombuffer(blob[_HDR:off], dtype="<u2").reshape(buckets, slots).copy()
    overflow = np.frombuffer(blob[off : off + novf * 8], dtype="<u8").copy()
    return table, overflow


def _bulk_insert(
    table: np.ndarray, fps: np.ndarray, b1s: np.ndarray, max_kicks: int = 500
) -> list[int]:
    """Insert (fp, bucket₁) pairs with eviction; returns overflow keys.

    Round-vectorized: each round elects one winner per distinct target
    bucket (stable first-in-order), gathers their bucket rows in one numpy
    fancy-index, places/switches/evicts without scatter conflicts, and
    losers simply retry next round. Every round makes progress for every
    distinct bucket, and eviction chains are bounded by ``max_kicks``
    before spilling to the overflow list — deterministic (no RNG: the
    eviction slot cycles with the round number), so shard builds are
    byte-reproducible across runs and parallelism levels.
    """
    buckets, slots = table.shape
    n = len(fps)
    if n == 0:
        return []
    cur_b = b1s.astype(np.uint32).copy()
    cur_f = fps.astype(np.uint16).copy()
    tried_alt = np.zeros(n, dtype=bool)
    kicks = np.zeros(n, dtype=np.int32)
    active = np.ones(n, dtype=bool)
    overflow: list[int] = []
    rnd = 0
    while True:
        pending = np.nonzero(active)[0]
        if len(pending) == 0:
            break
        bi = cur_b[pending]
        order = np.argsort(bi, kind="stable")
        sb = bi[order]
        first = np.ones(len(sb), dtype=bool)
        if len(sb) > 1:
            first[1:] = sb[1:] != sb[:-1]
        winners = pending[order[first]]
        wb = cur_b[winners]
        rows = table[wb]  # (w, slots) gather; winner buckets are distinct
        empty = rows == 0
        has_empty = empty.any(axis=1)
        slot_idx = empty.argmax(axis=1)
        placed = winners[has_empty]
        table[wb[has_empty], slot_idx[has_empty]] = cur_f[placed]
        active[placed] = False
        full = winners[~has_empty]
        if len(full):
            fresh = ~tried_alt[full]
            sw = full[fresh]  # try the alternate bucket before evicting
            if len(sw):
                cur_b[sw] = _alt_bucket(cur_b[sw], cur_f[sw], buckets)
                tried_alt[sw] = True
            ev = full[~fresh]
            if len(ev):
                over = ev[kicks[ev] >= max_kicks]
                if len(over):
                    overflow.extend(
                        int(k) for k in _canon_key(cur_b[over], cur_f[over], buckets)
                    )
                    active[over] = False
                ev = ev[kicks[ev] < max_kicks]
            if len(ev):
                evb = cur_b[ev]
                s = rnd % slots
                old_f = table[evb, s].copy()
                table[evb, s] = cur_f[ev]
                # the evicted fingerprint continues at ITS alternate bucket
                cur_f[ev] = old_f
                cur_b[ev] = _alt_bucket(evb, old_f, buckets)
                tried_alt[ev] = True  # it was just resident in evb
                kicks[ev] += 1
        rnd += 1
    return overflow


def _contains(
    table: np.ndarray, overflow: np.ndarray, fps: np.ndarray, b1s: np.ndarray
) -> np.ndarray:
    buckets, _ = table.shape
    b2 = _alt_bucket(b1s, fps, buckets)
    hit = (table[b1s] == fps[:, None]).any(axis=1) | (table[b2] == fps[:, None]).any(axis=1)
    if len(overflow):
        hit |= np.isin(_canon_key(b1s, fps, buckets), overflow)
    return hit


def build_cuckoo_shards(
    seen: DataFrame,
    num_shards: int = 64,
    buckets_per_shard: int = 1 << 14,
    slots: int = 4,
) -> DataFrame:
    """url_seen(url_hash, ...) → one (shard, table) row per shard."""
    if buckets_per_shard & (buckets_per_shard - 1):
        raise ValueError("buckets_per_shard must be a power of two (XOR bucket math)")
    from .shardprobe import check_shard_geometry

    check_shard_geometry(_HDR + buckets_per_shard * slots * 2, num_shards, "cuckoo config")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        table = np.zeros((buckets_per_shard, slots), dtype=np.uint16)
        fp, b1 = _fp_b1(pdf["url_hash"].to_numpy(np.int64), buckets_per_shard)
        overflow = _bulk_insert(table, fp, b1)
        return pd.DataFrame(
            {"shard": [shard], "table": [_pack(table, np.asarray(overflow, dtype=np.uint64))]}
        )

    return (
        seen.withColumn("shard", F.pmod(F.col("url_hash"), F.lit(num_shards)).cast("int"))
        .groupBy("shard")
        .applyInPandas(build, CUCKOO_SCHEMA)
    )


def _probe_blob(blob: bytes, arr: np.ndarray) -> np.ndarray:
    """Vectorized membership test of int64 hashes against one shard table.
    Geometry (buckets, slots) travels in the blob's header, so the probe
    needs no parameters."""
    table, overflow = _unpack(blob)
    fp, b1 = _fp_b1(arr, table.shape[0])
    return _contains(table, overflow, fp, b1)


def probe_maybe_seen(
    candidates: DataFrame,
    cuckoo: DataFrame,
    num_shards: int = 64,
    mode: str = "sharded",
    salts: int = 4,
    track: bool = False,
    **_ignored,
) -> DataFrame:
    """Candidates with a boolean ``__maybe_seen`` column from probing the
    shard tables, vectorized per Arrow batch — the single-pass primitive.

    ``mode="sharded"`` (the default, and the 10^10-URL shape): candidates
    cogroup with the ``(shard, table)`` rows on ``(pmod(url_hash,
    num_shards), salt)`` — each task ships exactly one shard's table, no
    process ever holds the whole filter (see ``shardprobe`` for the cost
    model and the blob/row-side guards). ``mode="broadcast"`` keeps the
    round-4 whole-filter broadcast variable for small filters; null-hash
    rows are split off at the PLAN level (a null inside an Arrow batch
    converts the int64 column to float64, silently corrupting hashes
    beyond 2^53 — asserted against in the UDF), and the broadcast is
    registered for scope-owned release only when ``track=True`` (see
    ``bloom.probe_maybe_seen``). Never a broadcast JOIN (blob-per-row:
    the stress-scale spill shape, plan-tripwired)."""
    from . import shardprobe

    if mode == "sharded":
        return shardprobe.probe_sharded(
            candidates,
            cuckoo.withColumnRenamed("table", "__blob"),
            "__blob",
            num_shards,
            _probe_blob,
            salts=salts,
        )
    if mode != "broadcast":
        raise ValueError(f"unknown cuckoo probe mode: {mode!r}")

    shard_tables = {int(r["shard"]): bytes(r["table"]) for r in cuckoo.collect()}
    bc = candidates.sparkSession.sparkContext.broadcast(shard_tables)
    if track:
        shardprobe.track_broadcast(bc)

    @F.pandas_udf("boolean")
    def probe(hashes: pd.Series) -> pd.Series:
        if len(hashes) == 0:
            return pd.Series(np.zeros(0, dtype=bool))
        if hashes.dtype.kind not in "iu":  # see docstring
            raise AssertionError(
                f"cuckoo probe received url_hash as {hashes.dtype} (expected "
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
            out[mask] = _probe_blob(blob, arr[mask])
        return pd.Series(out)

    flag = shardprobe.FLAG
    nulls = candidates.filter(F.col("url_hash").isNull()).withColumn(
        flag, F.lit(False)
    )
    probed = candidates.filter(F.col("url_hash").isNotNull()).withColumn(
        flag, probe(F.col("url_hash"))
    )
    return probed.unionByName(nulls)


def split_by_cuckoo(
    candidates: DataFrame,
    cuckoo: DataFrame,
    num_shards: int = 64,
    mode: str = "sharded",
    salts: int = 4,
    track: bool = False,
    **_ignored,
) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) view over ``probe_maybe_seen`` — two
    consumers of one lazy plan (evaluating both re-runs the probe unless
    persisted; the unseen-filter consumes the flag once instead)."""
    from .shardprobe import FLAG

    probed = probe_maybe_seen(candidates, cuckoo, num_shards, mode, salts, track)
    return probed.filter(~F.col(FLAG)).drop(FLAG), probed.filter(F.col(FLAG)).drop(FLAG)


def merge_cuckoo_shards(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two shard sets (incremental maintenance: tick t's filter =
    tick t-1's filter ∪ the seen delta's shards). Executor-side groupBy —
    never collects a table to the driver. Occupied slots and overflow
    entries of the non-base blobs are re-inserted into the base table with
    the same eviction machinery; geometry must match (asserted)."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        table = None
        overflow_keys: list[int] = []
        extra_b: list[np.ndarray] = []
        extra_f: list[np.ndarray] = []
        for blob in pdf["table"]:
            t, ovf = _unpack(blob)
            if table is None:
                table = t
                overflow_keys.extend(int(k) for k in ovf)
                continue
            if t.shape != table.shape:
                raise ValueError(f"cuckoo merge geometry mismatch: {t.shape} vs {table.shape}")
            bidx, sidx = np.nonzero(t)
            extra_b.append(bidx.astype(np.uint32))
            extra_f.append(t[bidx, sidx])
            if len(ovf):  # overflow key low 16 bits = fp, upper bits = a bucket
                extra_b.append((ovf >> np.uint64(16)).astype(np.uint32))
                extra_f.append((ovf & np.uint64(0xFFFF)).astype(np.uint16))
        if extra_b:
            overflow_keys.extend(
                _bulk_insert(table, np.concatenate(extra_f), np.concatenate(extra_b))
            )
        return pd.DataFrame(
            {"shard": [shard], "table": [_pack(table, np.asarray(overflow_keys, dtype=np.uint64))]}
        )

    return a.unionByName(b).groupBy("shard").applyInPandas(fold, CUCKOO_SCHEMA)


def delete_from_cuckoo(
    cuckoo: DataFrame, deletions: DataFrame, num_shards: int = 64
) -> DataFrame:
    """Remove one occurrence per deleted url_hash — the operation a bloom
    cannot do. ``deletions`` needs a ``url_hash`` column (e.g. a recrawl
    policy's slice of url_seen). Shards with no deletions pass through
    untouched. Standard cuckoo contract: delete only items actually
    inserted, at most once per insertion (tested in test_cuckoo.py)."""
    keyed = deletions.select(
        F.pmod(F.col("url_hash"), F.lit(num_shards)).cast("int").alias("shard"),
        "url_hash",
    )

    def drop(shards_pdf: pd.DataFrame, dels_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(shards_pdf) == 0:  # deletions for a shard with no table
            return pd.DataFrame({"shard": pd.Series([], dtype="int64"), "table": []})
        shard = int(shards_pdf["shard"].iloc[0])
        blob = shards_pdf["table"].iloc[0]
        if len(dels_pdf) == 0:
            return pd.DataFrame({"shard": [shard], "table": [blob]})
        table, overflow = _unpack(blob)
        buckets, _ = table.shape
        fp, b1 = _fp_b1(dels_pdf["url_hash"].to_numpy(np.int64), buckets)
        b2 = _alt_bucket(b1, fp, buckets)
        keys = _canon_key(b1, fp, buckets)
        ovf = list(overflow)
        # deletions are the cold path (a recrawl slice, not the frontier):
        # a per-row loop here is bounded by the policy's batch size
        for i in range(len(fp)):
            for b in (b1[i], b2[i]):
                s = np.nonzero(table[b] == fp[i])[0]
                if len(s):
                    table[b, s[0]] = 0
                    break
            else:
                if keys[i] in ovf:
                    ovf.remove(keys[i])
        return pd.DataFrame(
            {"shard": [shard], "table": [_pack(table, np.asarray(ovf, dtype=np.uint64))]}
        )

    return (
        cuckoo.groupBy("shard")
        .cogroup(keyed.groupBy("shard"))
        .applyInPandas(drop, CUCKOO_SCHEMA)
    )


def filter_unseen_with_cuckoo(
    candidates: DataFrame,
    seen: DataFrame,
    cuckoo: DataFrame | None,
    num_shards: int = 64,
    **probe_kw,
) -> DataFrame:
    """Exact unseen-filter accelerated by the cuckoo prefilter when given.
    Result is identical to the plain left_anti (tested in test_cuckoo.py);
    the exact backstop is the same (url_hash, fp128) anti-join the bloom
    path uses (see bloom.exact_unseen for the identity rationale).
    Single-probe shape as in ``bloom.filter_unseen_with_bloom``: the
    flagged frame persists (scope-released), the maybe residue alone
    feeds the anti-join."""
    from pyspark import StorageLevel

    from . import shardprobe
    from .bloom import exact_unseen
    from .shardprobe import FLAG

    if cuckoo is None:
        return exact_unseen(candidates, seen)
    probed = probe_maybe_seen(candidates, cuckoo, num_shards=num_shards, **probe_kw).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if probe_kw.get("track"):  # scope-owned release (crawler tick); else LRU
        shardprobe.track_cache(probed)
    new = probed.filter(~F.col(FLAG)).drop(FLAG)
    maybe = probed.filter(F.col(FLAG)).drop(FLAG)
    return new.unionByName(exact_unseen(maybe, seen))
