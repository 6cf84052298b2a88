"""Global plan-shape guards over the whole entry-query surface.

Every `__spark_entry__.queries()` entry is compiled (not executed) at
sf0.001 and its physical plan inspected:

- **No accidental cartesian products.** The only quadratic plans allowed
  are the two documented exact verification baselines
  (`embedding_near_dups_exact`, `similarity_topk_cosine`-style broadcast
  NL joins are fine — broadcast NL against a bounded probe side is the
  designed shape; what's banned is `CartesianProduct`, the
  shuffle-everything form that would never survive 100 TB).
- **The BFF bloom never rides the rows** (the shard bitsets travel as a
  task-level broadcast VARIABLE; a broadcast JOIN would attach the blob
  to every candidate row and multiply the Arrow transfer into the probe
  UDF by the filter size — tens of GB of spill at stress scale).
- **A plain projection query pushes its column pruning into the scan**
  (ReadSchema carries only the needed columns).

These are regression tripwires: a refactor that silently turns a bucketed
join into a cartesian, or drops the explicit broadcast, fails here even
though results stay correct at test scale.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

# exact ground-truth baselines are INTENTIONALLY quadratic (broadcast NL),
# and brute-force ANN scores every (probe, corpus) pair by design
ALLOWED_QUADRATIC = {
    "embedding_near_dups_exact",
    "similarity_topk_cosine",
    # composes brute_force_topk with itself (truncated candidates vs
    # full-dim truth) — the same bounded-probe broadcast NL as above,
    # once per dim in the curve
    "truncation_recall",
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _queries():
    import __spark_entry__ as em

    return em.queries()


@pytest.mark.parametrize("name", sorted(_queries().keys()))
def test_no_cartesian_product_anywhere(spark, name):
    if name in ("crawl_tick",):  # stateful: builds checkpoint dirs; covered in test_crawler
        pytest.skip("crawl_tick exercises the full engine, not a single plan")
    if name == "bpe_tokenize":
        pytest.skip("training collects per-sweep argmaxes; plan is per-sweep, covered in test_bpe")
    df = _queries()[name](spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, f"{name} compiled to a cartesian product"
    if name not in ALLOWED_QUADRATIC:
        # BroadcastNestedLoopJoin is the broadcast-side quadratic form —
        # allowed only where a documented bounded side exists
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} compiled to a broadcast NL join — if this is a new "
            "bounded-side exact baseline, add it to ALLOWED_QUADRATIC with "
            "a docstring note; otherwise a join condition got lost"
        )


def test_bff_bloom_never_rides_the_rows(spark):
    from spider_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    # bloom_min_dups=0 forces the bloom path: the default gate would route
    # this low-dup corpus to the plain exact join (no probe to inspect)
    plan = _plan(dedup.bff_paragraph_dedup(docs, use_bloom=True, bloom_min_dups=0))
    # the bloom probe stage exists (pandas UDF named in the plan)...
    assert "probe" in plan or "ArrowEvalPython" in plan or "PythonUDF" in plan
    # ...and the shard bitsets do NOT appear as a row column: a broadcast
    # JOIN of the bloom table would attach the blob to every candidate
    # row and multiply the Arrow transfer into the probe by the filter
    # size (at 2^23-bit shards, ~1 MiB/row — the 10M-page stress filled
    # an 80 GB disk through DiskRowQueue spill this way). The filter
    # rides a task-level broadcast VARIABLE, invisible to the plan.
    assert "bits" not in plan


def test_column_pruning_reaches_scan(spark):
    import __spark_entry__ as em

    df = em.queries()["token_counts"](spark, SF_DIR)
    plan = _plan(df)
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, "expected a parquet scan with ReadSchema"
    # the documents table has (doc_id, url, text, lang, quality_hint...);
    # a token-count projection must not drag unrelated columns through
    assert "url" not in scan[0].split("ReadSchema")[1]
