"""Scan-locality layout audit: SURT-clustered files must make host-scoped
reads touch O(host) files while insertion order touches O(table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import layout

SCHEMA = "url string, host string, seq bigint"


def _pages(n=400, hosts=20):
    # crawl order interleaves hosts (i % hosts) — the worst case for locality
    return [
        (f"https://h{i % hosts}.test/p/{i}", f"h{i % hosts}.test", i)
        for i in range(n)
    ]


def test_exact_assignment_matches_brute(spark):
    rows = _pages(n=100, hosts=10)
    df = spark.createDataFrame(rows, SCHEMA)
    out = layout.file_assignment(df, 30, [F.col("seq")]).collect()
    for r in out:
        assert r._fid == r.seq // 30


def test_surt_layout_beats_insertion(spark):
    df = spark.createDataFrame(_pages(), SCHEMA)
    stats = {r.layout: r for r in layout.layout_compare(df, 50).collect()}
    ins, srt = stats["insertion"], stats["surt"]
    assert ins.n_files == srt.n_files == 8
    # insertion order smears every host across every file
    assert ins.avg_files_per_host_r == pytest.approx(8.0)
    assert ins.avg_hosts_per_file_r == pytest.approx(20.0)
    # SURT clustering: a host's 20 rows span at most 2 file boundaries
    assert srt.max_files_per_host <= 2
    assert srt.avg_hosts_per_file_r < ins.avg_hosts_per_file_r / 3


def test_range_mode_equivalent_statistics(spark):
    # the scale path (repartitionByRange) must show the same locality
    # STORY even if sampled boundaries shift files slightly
    df = spark.createDataFrame(_pages(), SCHEMA)
    stats = {
        r.layout: r for r in layout.layout_compare(df, 50, exact=False).collect()
    }
    srt, ins = stats["surt"], stats["insertion"]
    assert srt.max_files_per_host <= 3
    assert ins.avg_files_per_host_r > srt.avg_files_per_host_r * 2


def test_single_file_degenerate(spark):
    df = spark.createDataFrame(_pages(n=10, hosts=3), SCHEMA)
    stats = {r.layout: r for r in layout.layout_compare(df, 1000).collect()}
    for s in stats.values():
        assert s.n_files == 1
        assert s.max_files_per_host == 1
