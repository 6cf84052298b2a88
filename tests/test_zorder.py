"""Z-order interleave + 2-D scan-locality audit (operators/layout.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import layout


def _ref_morton(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i + 1)
        out |= ((b >> i) & 1) << (2 * i)
    return out


def test_zorder_key_matches_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 13, 31) for b in (0, 2, 7, 30, 31)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["a", "b"]))
    got = df.select(
        "a", "b", layout.col_zorder_key(F.col("a"), F.col("b"), 5).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _ref_morton(r["a"], r["b"], 5), (r["a"], r["b"])
    # the canonical small cases
    two = spark.createDataFrame(pd.DataFrame([(1, 0), (0, 1), (1, 1)], columns=["a", "b"]))
    vals = {
        (r["a"], r["b"]): r["z"]
        for r in two.select(
            "a", "b", layout.col_zorder_key(F.col("a"), F.col("b"), 4).alias("z")
        ).collect()
    }
    assert vals == {(1, 0): 2, (0, 1): 1, (1, 1): 3}
    with pytest.raises(ValueError):
        layout.col_zorder_key(F.col("a"), F.col("b"), 0)


def test_zorder_box_beats_single_key_layouts(spark):
    # 32×32 grid, 32 rows/file; an aligned 8×8 box is 64 z-contiguous
    # cells → 2 files under z-order, but 8 stripe-files under either
    # single-key sort
    grid = spark.range(1024).select(
        (F.col("id") / 32).cast("int").alias("host_bucket"),
        (F.col("id") % 32).cast("int").alias("time_bucket"),
    )
    got = {
        r["layout"]: r
        for r in layout.zorder_locality_audit(
            grid, "host_bucket", "time_bucket",
            rows_per_file=32, box_a=(0, 7), box_b=(0, 7), bits=5,
        ).collect()
    }
    assert got["zorder"]["n_files"] == 32
    assert got["zorder"]["files_touched"] == 2
    assert got["a_then_b"]["files_touched"] == 8
    assert got["b_then_a"]["files_touched"] == 8
    assert (
        got["zorder"]["files_touched_frac_r"]
        < got["a_then_b"]["files_touched_frac_r"]
    )


def test_zorder_single_dimension_scan_cost(spark):
    """The trade: a full-stripe scan on dimension a is 1 file under
    a_then_b but spread under z-order — the audit shows both sides."""
    grid = spark.range(1024).select(
        (F.col("id") / 32).cast("int").alias("a"),
        (F.col("id") % 32).cast("int").alias("b"),
    )
    got = {
        r["layout"]: r["files_touched"]
        for r in layout.zorder_locality_audit(
            grid, "a", "b", rows_per_file=32,
            box_a=(3, 3), box_b=(0, 31), bits=5,
        ).collect()
    }
    assert got["a_then_b"] == 1  # its own dimension: perfect
    assert got["b_then_a"] == 32  # the other dimension: full scan
    assert 1 < got["zorder"] < 32  # the balanced middle
