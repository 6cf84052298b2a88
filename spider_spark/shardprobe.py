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
repartitioned by ``pmod(url_hash, num_shards)`` and cogrouped with the
``(shard, blob)`` table, so each task receives the candidate rows of ONE
shard plus that one shard's blob — per-task filter payload is exactly
``len(blob)`` bytes (``bits_per_shard/8`` for the bloom), no process ever
holds more than the shards of the tasks it is currently running, and the
driver never materializes any blob at all. The shard blob moves through the
same shuffle machinery as the rows (spillable, locality-scheduled), not
through the driver.

Cost model vs the broadcast variable: one extra exchange of the candidate
rows (~50 B/row — they were about to shuffle into the exact anti-join
anyway) buys O(filter_size / num_shards) per-task memory instead of
O(filter_size) per-executor. At 1000 executors × 10 GiB filter that is the
difference between 10 TB of aggregate broadcast traffic and one 10 GiB
shuffle read spread across the cluster.

Scale guard: a config whose per-shard blob exceeds ``MAX_SHARD_BLOB_BYTES``
fails fast with instructions to raise ``num_shards`` — a single Arrow batch
must hold the blob, so unbounded shard sizes would reintroduce the memory
cliff this module exists to remove.
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


def split_sharded(
    candidates: DataFrame,
    shards_df: DataFrame,
    blob_col: str,
    num_shards: int,
    probe_blob: Callable[[bytes, np.ndarray], np.ndarray],
) -> tuple[DataFrame, DataFrame]:
    """Cogroup candidates with their shard blob and split into
    (definitely_new, maybe_seen).

    ``probe_blob(blob, hashes) -> bool ndarray`` runs once per (task, shard)
    on the int64 url_hashes of that shard's candidates. Invariants enforced
    in-task:

    - **one shard per task**: the cogroup key is the shard id, so the blob
      side of each group must contain at most one row — asserted, so a
      refactor that double-keys the shard table fails loudly instead of
      probing the wrong blob;
    - **null url_hash → definitely_new**: malformed candidate rows must not
      crash the tick (they route to the exact anti-join's input untouched
      by the accelerator, matching the pre-accelerator semantics).
    """
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("__maybe_seen", T.BooleanType(), False)]
    )
    cols = [f.name for f in candidates.schema.fields]

    def fn(key, cand_pdf: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(blob_pdf) > 1:
            raise AssertionError(
                f"shard-local probe invariant violated: task for shard {key} "
                f"received {len(blob_pdf)} shard blobs (expected <= 1)"
            )
        cand_pdf = cand_pdf[cols].copy()
        n = len(cand_pdf)
        maybe = np.zeros(n, dtype=bool)
        if n and len(blob_pdf) == 1:
            blob = bytes(blob_pdf[blob_col].iloc[0])
            check_shard_geometry(len(blob), num_shards, "shard-local probe")
            hashes = cand_pdf["url_hash"]
            valid = hashes.notna().to_numpy()
            if valid.any():
                arr = hashes.to_numpy()[valid].astype(np.int64)
                maybe[valid] = probe_blob(blob, arr)
        cand_pdf["__maybe_seen"] = maybe
        return cand_pdf

    # numpy % matches F.pmod for a positive divisor (sign of divisor); a
    # null url_hash yields a null key group with no blob side → all-new.
    shard_key = F.pmod(F.col("url_hash"), F.lit(num_shards)).cast("int")
    probed = (
        candidates.groupBy(shard_key.alias("__shard"))
        .cogroup(shards_df.groupBy(F.col("shard").alias("__shard")))
        .applyInPandas(fn, out_schema)
    )
    definitely_new = probed.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    maybe_seen = probed.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    return definitely_new, maybe_seen


# ---------------------------------------------------------------------------
# Broadcast-variable mode (round-4 shape), retained for small filters where
# avoiding the probe exchange wins. Broadcasts are tracked so the crawler can
# reclaim their disk/memory after the tick's actions complete (ADVICE r04:
# relying on Python GC + ContextCleaner lets broadcast files accumulate over
# a long crawl).

_LIVE_BROADCASTS: list = []


def track_broadcast(bc) -> None:
    _LIVE_BROADCASTS.append(bc)


def release_probe_broadcasts() -> None:
    """Unpersist + destroy every probe broadcast created since the last
    release. Call AFTER the tick's actions (frontier/results writes) have
    completed — the broadcast value is consumed at action time."""
    while _LIVE_BROADCASTS:
        bc = _LIVE_BROADCASTS.pop()
        try:
            bc.unpersist(blocking=False)
            bc.destroy(blocking=False)
        except Exception:
            pass  # already destroyed / context gone — nothing to reclaim
