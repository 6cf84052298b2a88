"""Shard-local probe plumbing shared by the bloom and cuckoo seen-filters.

At 10^10-URL scale the seen-filter is ~10 GiB (10 bits/URL bloom, or
equivalent cuckoo tables). Two shapes were tried and rejected:

- **broadcast JOIN** (rounds 1-3): attached each candidate's shard blob to
  the row itself, so the Arrow transfer into the probe UDF shipped
  ``bits_per_shard/8`` bytes PER CANDIDATE — observed as tens of GB of
  DiskRowQueue spill in the 10M-page stress;
- **whole-filter broadcast VARIABLE** (round 4): fixed the per-row payload,
  but the driver ``collect()`` and every executor's first ``.value`` access
  still materialize the ENTIRE filter in one process — ~10 GiB per JVM at
  north-star scale, and the broadcast files accumulate on disk until GC.

This module is the round-5 shape: **shard-local shipping**. Candidates are
repartitioned by ``(pmod(url_hash, num_shards), salt)`` and cogrouped with
the ``(shard, blob)`` table (blob replicated per salt), so each task
receives the candidate rows of ONE (shard, salt) cell plus that one
shard's blob — per-task filter payload is exactly ``len(blob)`` bytes
(``bits_per_shard/8`` for the bloom), no process ever holds more than the
shards of the tasks it is currently running, and the driver never
materializes any blob at all. The shard blob moves through the same
shuffle machinery as the rows (spillable, locality-scheduled), not through
the driver.

Cost model vs the broadcast variable: one extra exchange of the candidate
rows (~50 B/row — they were about to shuffle into the exact anti-join
anyway) buys O(filter_size / num_shards) per-task memory instead of
O(filter_size) per-executor. At 1000 executors × 10 GiB filter that is the
difference between 10 TB of aggregate broadcast traffic and one 10 GiB
shuffle read spread across the cluster.

Two scale guards, one per payload side:

- **blob side**: a config whose per-shard blob exceeds
  ``MAX_SHARD_BLOB_BYTES`` fails fast with instructions to raise
  ``num_shards`` — a single Arrow batch must hold the blob.
- **row side**: ``applyInPandas`` materializes each cogroup as ONE pandas
  frame, so a (shard, salt) cell holds ``candidates/(num_shards·salts)``
  rows in memory and probe parallelism is ``num_shards·salts`` tasks. The
  ``salts`` knob multiplies row-side parallelism/memory-splitting at the
  cost of shipping each blob ``salts`` times (blob shuffle volume =
  salts × filter size — keep salts small and raise ``num_shards`` first,
  which shrinks BOTH payloads without duplication).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# One shard blob must fit comfortably in a task's Arrow batch alongside its
# candidate rows. 256 MiB/shard × the default 64 shards = a 16 GiB filter —
# beyond that, raise num_shards (shards are cheap; the build is one
# applyInPandas either way). Fail-fast beats an executor OOM mid-crawl.
MAX_SHARD_BLOB_BYTES = 256 << 20


def check_shard_geometry(blob_bytes: int, num_shards: int, what: str) -> None:
    """Fail fast on configs whose per-shard blob exceeds the documented cap."""
    if blob_bytes > MAX_SHARD_BLOB_BYTES:
        raise ValueError(
            f"{what}: per-shard blob of {blob_bytes} bytes exceeds the "
            f"{MAX_SHARD_BLOB_BYTES}-byte cap (num_shards={num_shards}). "
            "Raise num_shards so each task's filter payload stays bounded "
            "(see spider_spark.shardprobe.MAX_SHARD_BLOB_BYTES)."
        )


FLAG = "__maybe_seen"


def probe_sharded(
    candidates: DataFrame,
    shards_df: DataFrame,
    blob_col: str,
    num_shards: int,
    probe_blob: Callable[[bytes, np.ndarray], np.ndarray],
    salts: int = 4,
) -> DataFrame:
    """Cogroup candidates with their shard blob and return candidates with
    a boolean ``__maybe_seen`` column — the single-pass primitive behind
    both ``split_sharded`` and the accelerated unseen-filters (which
    consume the flag ONCE instead of re-executing the probe per branch).

    ``probe_blob(blob, hashes) -> bool ndarray`` runs once per
    (task, shard) on the int64 url_hashes of that cell's candidates.
    Invariants enforced in-task:

    - **one blob per cell**: the cogroup key is (shard, salt) and the blob
      side replicates each shard row once per salt, so each group's blob
      side must contain at most one row — asserted, so a refactor that
      double-keys the shard table fails loudly instead of probing the
      wrong blob;
    - **null url_hash → definitely_new**: a null hash yields a null
      grouping key, so null rows form their OWN cogroup (never sharing a
      pandas frame with valid hashes) with no blob side → flag False,
      matching the pre-accelerator dropna semantics. Because groups are
      null-pure, the url_hash column always arrives as a true int64 —
      asserted, since a float64 arrival would silently corrupt xxhash64
      values above 2^53 (ints round-tripped through float64 lose
      precision).
    """
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField(FLAG, T.BooleanType(), False)]
    )
    cols = [f.name for f in candidates.schema.fields]

    def fn(key, cand_pdf: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(blob_pdf) > 1:
            raise AssertionError(
                f"shard-local probe invariant violated: task for cell {key} "
                f"received {len(blob_pdf)} shard blobs (expected <= 1)"
            )
        cand_pdf = cand_pdf[cols].copy()
        n = len(cand_pdf)
        maybe = np.zeros(n, dtype=bool)
        if n and len(blob_pdf) == 1:
            blob = bytes(blob_pdf[blob_col].iloc[0])
            check_shard_geometry(len(blob), num_shards, "shard-local probe")
            hashes = cand_pdf["url_hash"]
            if hashes.dtype.kind not in "iu":
                raise AssertionError(
                    "shard-local probe invariant violated: url_hash arrived "
                    f"as {hashes.dtype} (expected int64) — a float64 batch "
                    "silently corrupts 64-bit hashes beyond 2^53"
                )
            maybe[:] = probe_blob(blob, hashes.to_numpy(np.int64))
        cand_pdf[FLAG] = maybe
        return cand_pdf

    # numpy % matches F.pmod for a positive divisor (sign of divisor); a
    # null url_hash yields a null key cell with no blob side → all-new.
    shard_key = F.pmod(F.col("url_hash"), F.lit(num_shards)).cast("int")
    # salt from independent bits of the hash (xxhash64 of the hash value),
    # so a hot shard's rows spread across `salts` cells
    salt_key = F.pmod(F.xxhash64(F.col("url_hash")), F.lit(salts)).cast("int")
    blob_side = shards_df.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return (
        candidates.groupBy(shard_key.alias("__shard"), salt_key.alias("__salt"))
        .cogroup(blob_side.groupBy(F.col("shard").alias("__shard"), F.col("__salt")))
        .applyInPandas(fn, out_schema)
    )


def split_sharded(
    candidates: DataFrame,
    shards_df: DataFrame,
    blob_col: str,
    num_shards: int,
    probe_blob: Callable[[bytes, np.ndarray], np.ndarray],
    salts: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) view over ``probe_sharded``. NOTE: the
    two returned frames are two consumers of one lazy plan — downstream
    code that evaluates both re-runs the probe unless it persists. The
    accelerated unseen-filters avoid the split entirely (single anti-join
    over the flagged frame); prefer ``probe_sharded`` for new call sites."""
    probed = probe_sharded(candidates, shards_df, blob_col, num_shards, probe_blob, salts)
    return probed.filter(~F.col(FLAG)).drop(FLAG), probed.filter(F.col(FLAG)).drop(FLAG)


# ---------------------------------------------------------------------------
# Broadcast-variable mode (round-4 shape), retained for small filters where
# avoiding the probe exchange wins. Broadcast registration is OPT-IN
# (track=True): a caller that manages a bounded scope — the crawler tick,
# which calls release after its actions complete — tracks its broadcasts
# for deterministic reclamation; library call sites (e.g. BFF's gated
# bloom) leave track=False and rely on GC + ContextCleaner exactly as
# before round 5, so a long-lived session never pins them in a module
# registry, and a concurrent crawler tick can never destroy a broadcast it
# does not own.

_LIVE_BROADCASTS: list = []
_LIVE_CACHES: list = []


def track_broadcast(bc) -> None:
    _LIVE_BROADCASTS.append(bc)


def track_cache(df: DataFrame) -> None:
    """Register a persisted probe frame for the same scope-owned
    reclamation as broadcasts (the unseen-filter persists its flagged
    frame so the two split branches evaluate the probe once)."""
    _LIVE_CACHES.append(df)


def release_probe_broadcasts() -> None:
    """Unpersist + destroy every TRACKED probe broadcast and unpersist
    every tracked probe cache created since the last release. Call AFTER
    the owning scope's actions have completed — the values are consumed
    at action time. Untracked resources reclaim via GC + ContextCleaner /
    the session cache LRU, as with every other persisted intermediate in
    the engine."""
    while _LIVE_BROADCASTS:
        bc = _LIVE_BROADCASTS.pop()
        try:
            bc.unpersist(blocking=False)
            bc.destroy(blocking=False)
        except Exception:
            pass  # already destroyed / context gone — nothing to reclaim
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
