"""Per-IP politeness (Heritrix ip-queue discipline): vhosts sharing a
server share one budget. Differential against brute force, exactness of
the two-phase salted split, unresolved-host fallback, broadcast gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import adaptive

FRONTIER_SCHEMA = (
    "url string, host string, priority int, discovered_tick int, seq bigint"
)
IP_SCHEMA = "host string, ip string"


def _frontier(n=60, hosts=12):
    return [
        (f"https://h{i % hosts}.test/p{i}", f"h{i % hosts}.test", i % 5, 0, i)
        for i in range(n)
    ]


def _ips(hosts=12, ips=3):
    # several vhosts per ip
    return [(f"h{h}.test", f"10.0.0.{h % ips}") for h in range(hosts)]


def _brute(frontier, host_ip, budget):
    ipmap = dict(host_ip)
    by_ip: dict = {}
    for url, host, pri, tick, seq in frontier:
        ip = ipmap.get(host, f"host:{host}")
        by_ip.setdefault(ip, []).append((pri, tick, seq, url))
    keep = {}
    for ip, rows in by_ip.items():
        for i, (_, _, _, url) in enumerate(sorted(rows)):
            keep[url] = (ip, i < budget)
    return keep


def test_matches_brute_force(spark):
    fr = _frontier()
    ips = _ips()
    out = adaptive.ip_politeness_topk(
        spark.createDataFrame(fr, FRONTIER_SCHEMA),
        spark.createDataFrame(ips, IP_SCHEMA),
        per_ip_budget=4,
    ).collect()
    want = _brute(fr, ips, 4)
    assert len(out) == len(fr)
    for r in out:
        assert (r.ip, r.is_ip_selected) == want[r.url], r.url


def test_unresolved_host_gets_own_queue(spark):
    fr = [("https://x.test/a", "x.test", 0, 0, 1), ("https://y.test/a", "y.test", 0, 0, 2)]
    out = {
        r.url: r
        for r in adaptive.ip_politeness_topk(
            spark.createDataFrame(fr, FRONTIER_SCHEMA),
            spark.createDataFrame([("x.test", "10.0.0.1")], IP_SCHEMA),
            per_ip_budget=1,
        ).collect()
    }
    assert out["https://x.test/a"].ip == "10.0.0.1"
    assert out["https://y.test/a"].ip == "host:y.test"
    # both selected: separate queues
    assert out["https://x.test/a"].is_ip_selected
    assert out["https://y.test/a"].is_ip_selected


def test_two_phase_split_is_exact(spark):
    fr = _frontier(n=200, hosts=20)
    ips = _ips(hosts=20, ips=2)  # two hot IPs with 100 rows each
    a = adaptive.ip_politeness_topk(
        spark.createDataFrame(fr, FRONTIER_SCHEMA),
        spark.createDataFrame(ips, IP_SCHEMA),
        per_ip_budget=5,
        salt_buckets=16,
    )
    b = adaptive.ip_politeness_topk(
        spark.createDataFrame(fr, FRONTIER_SCHEMA),
        spark.createDataFrame(ips, IP_SCHEMA),
        per_ip_budget=5,
        salt_buckets=1,
    )
    sa = {(r.url, r.is_ip_selected) for r in a.collect()}
    sb = {(r.url, r.is_ip_selected) for r in b.collect()}
    assert sa == sb
    assert sum(1 for _, s in sa if s) == 2 * 5


def test_budget_cap_per_ip(spark):
    fr = _frontier(n=120, hosts=12)
    ips = _ips(hosts=12, ips=3)
    out = adaptive.ip_politeness_topk(
        spark.createDataFrame(fr, FRONTIER_SCHEMA),
        spark.createDataFrame(ips, IP_SCHEMA),
        per_ip_budget=7,
    ).collect()
    per_ip: dict = {}
    for r in out:
        if r.is_ip_selected:
            per_ip[r.ip] = per_ip.get(r.ip, 0) + 1
    assert all(v <= 7 for v in per_ip.values())
    assert len(per_ip) == 3


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_broadcast_gate_both_sides(spark, monkeypatch):
    fr = spark.createDataFrame(_frontier(), FRONTIER_SCHEMA)
    ips = spark.createDataFrame(_ips(), IP_SCHEMA)
    under = adaptive.ip_politeness_topk(fr, ips, per_ip_budget=3)
    assert "BroadcastHashJoin" in _physical(under)
    monkeypatch.setattr(adaptive, "IP_BROADCAST_ROWS", 0)
    over = adaptive.ip_politeness_topk(fr, ips, per_ip_budget=3)
    assert "BroadcastHashJoin" not in _physical(over)
    pinned = adaptive.ip_politeness_topk(fr, ips, per_ip_budget=3, broadcast=True)
    assert "BroadcastHashJoin" in _physical(pinned)


def test_col_ip_bucket_is_dotted_quad(spark):
    df = spark.createDataFrame([("a.test",), ("b.test",)], "host string")
    rows = df.select(adaptive.col_ip_bucket("host", n_ips=256).alias("ip")).collect()
    for r in rows:
        parts = r.ip.split(".")
        assert parts[:2] == ["10", "0"]
        assert 0 <= int(parts[2]) <= 255 and 0 <= int(parts[3]) <= 255
