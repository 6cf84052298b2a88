"""Registered-domain extraction + domain budgets (operators/domains.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import domains


def _rd(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    rows = df.select(
        "host", domains.col_registered_domain("host").alias("rd")
    ).collect()
    return {r.host: r.rd for r in rows}


def test_etld1_rules(spark):
    got = _rd(
        spark,
        [
            "www.example.com",
            "a.b.c.example.com",
            "example.com",
            "deep.sub.example.co.uk",
            "example.co.uk",
            "localhost",
            "192.168.0.1",
            "WWW.Example.COM",   # case folded
            "blog123.farm.co.jp",
        ],
    )
    assert got["www.example.com"] == "example.com"
    assert got["a.b.c.example.com"] == "example.com"
    assert got["example.com"] == "example.com"
    assert got["deep.sub.example.co.uk"] == "example.co.uk"
    assert got["example.co.uk"] == "example.co.uk"
    assert got["localhost"] == "localhost"
    assert got["192.168.0.1"] == "192.168.0.1"
    assert got["WWW.Example.COM"] == "example.com"
    assert got["blog123.farm.co.jp"] == "farm.co.jp"


def test_two_label_suffix_host_passes_through(spark):
    # 'co.uk' itself has no registrable label — last-2 rule keeps it whole
    assert _rd(spark, ["co.uk"])["co.uk"] == "co.uk"


def test_null_host(spark):
    df = spark.createDataFrame([(None,)], "host string")
    assert df.select(domains.col_registered_domain("host").alias("rd")).collect()[0].rd is None


def test_custom_suffix_injection(spark):
    df = spark.createDataFrame([("x.y.custom.zz",)], "host string")
    rd = df.select(
        domains.col_registered_domain("host", suffixes=["custom.zz"]).alias("rd")
    ).collect()[0].rd
    assert rd == "y.custom.zz"


def test_domain_rollup_surfaces_farm(spark):
    rows = [(f"blog{i}.farm.com",) for i in range(50)] + [
        ("www.indie.org",),
        ("indie.org",),
    ]
    roll = {
        r.domain: r
        for r in domains.domain_rollup(
            spark.createDataFrame(rows, "host string")
        ).collect()
    }
    assert roll["farm.com"].n_hosts == 50 and roll["farm.com"].n_urls == 50
    assert roll["indie.org"].n_hosts == 2


def test_domain_budget_filter_caps_farm_not_indies(spark):
    rows = [(f"blog{i}.farm.com", f"http://blog{i}.farm.com/", float(i)) for i in range(40)]
    rows += [(f"site{i}.org", f"http://site{i}.org/", 0.0) for i in range(10)]
    frontier = spark.createDataFrame(rows, "host string, url string, priority double")
    kept = domains.domain_budget_filter(frontier, per_domain_budget=5).collect()
    by_dom = {}
    for r in kept:
        d = "farm.com" if "farm" in r.host else r.host.split(".", 0)[0]
        by_dom.setdefault("farm" if "farm" in r.host else "indie", []).append(r)
    assert len(by_dom["farm"]) == 5
    assert len(by_dom["indie"]) == 10  # every indie domain keeps its row
    # deterministic: the 5 lowest-priority farm rows survive
    assert sorted(r.priority for r in by_dom["farm"]) == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_budget_filter_deterministic_across_partitioning(spark):
    rows = [(f"h{i % 7}.farm.com", f"http://h{i % 7}.farm.com/p{i}", float(i % 3)) for i in range(60)]
    frontier = spark.createDataFrame(rows, "host string, url string, priority double")
    a = sorted(r.url for r in domains.domain_budget_filter(frontier.repartition(1), 9).collect())
    b = sorted(r.url for r in domains.domain_budget_filter(frontier.repartition(13), 9).collect())
    assert a == b and len(a) == 9


def test_idn_host_audit_cases(spark):
    from spider_spark.operators.domains import idn_host_audit

    cases = [
        ("plain.example.com", (False, "plain.example.com", "latin", False, False)),
        ("xn--mnchen-3ya.de", (True, "münchen.de", "latin", False, False)),
        # all-Cyrillic homograph label: IDN, NOT mixed (single script)
        ("xn--80ak6aa92e.com",
         (True, "аррӏе.com", "cyrillic|latin", False, False)),
        # Cyrillic а + Latin pple in ONE label → flagged
        ("xn--pple-43d.com",
         (True, "аpple.com", "cyrillic|latin", True, False)),
        ("xn--fiq228c.cn", (True, "中文.cn", "latin|other", False, False)),
        # Greek omicron + latin in one label → flagged
        ("xn--gogle-rce.com", None),  # filled below after decode check
        ("xn--999999999.com", (True, None, None, False, True)),
        ("UPPER.COM", (False, "upper.com", "latin", False, False)),
        ("127.0.0.1", (False, "127.0.0.1", None, False, False)),
    ]
    greek = "xn--gogle-rce".removeprefix("xn--").encode().decode("punycode")
    assert any("Ͱ" <= ch <= "Ͽ" for ch in greek)
    cases[5] = ("xn--gogle-rce.com", (True, greek + ".com", "greek|latin", True, False))
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = {
        r["host"]: (
            r["is_idn"], r["unicode_host"], r["scripts"],
            r["mixed_script"], r["decode_error"],
        )
        for r in idn_host_audit(df).collect()
    }
    for h, want in cases:
        assert got[h] == want, h
