"""SparkSession construction tuned for the crawl/analytics workload.

All knobs here are scale-oriented defaults: AQE on (runtime coalescing +
skew-join splitting), Arrow on (vectorized pandas UDF transfer), shuffle
partition count sized to the parallelism in use. On a real cluster the same
builder is used by spark-submit jobs; only master/cores differ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spider-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # ~2x cores keeps all slots busy without tiny-task overhead at
        # local scale; AQE coalesces further at runtime. On a cluster this
        # would be sized to total executor cores.
        shuffle_partitions = max(2 * cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # UDF-heavy pipeline: split scans finer than the 128m default so a
        # CPU-bound parse stage gets ≥2 tasks/core even on modest inputs
        # (bytes-based splitting underestimates per-row extraction cost)
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size bounds PER-WORKER memory, not throughput: with
        # ~30 KB page rows, 10k-row batches mean ~300 MB held per Python
        # worker — at 32 workers that alone thrashes the box. 2k rows keeps
        # each worker's resident batch ~60 MB while still amortizing IPC.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
