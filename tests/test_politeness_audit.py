"""Rate-limit compliance audit (adaptive.politeness_compliance)."""

from __future__ import annotations

import datetime as dt

from spider_spark.operators import adaptive as ad


def _fetches(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [(h, base + dt.timedelta(milliseconds=ms)) for h, ms in rows]
    return spark.createDataFrame(data, "host string, ts timestamp")


def _delays(spark, rows):
    return spark.createDataFrame(rows, "host string, crawl_delay_ms int")


def _run(spark, fetches, delays):
    return {
        r["host"]: (
            r["n_fetches"],
            r["min_gap_ms"],
            r["crawl_delay_ms"],
            r["n_violations"],
            r["compliant"],
        )
        for r in ad.politeness_compliance(
            _fetches(spark, fetches), _delays(spark, delays)
        ).collect()
    }


def test_violations_and_min_gap(spark):
    fetches = [("a", 0), ("a", 500), ("a", 2000), ("a", 2600)]
    got = _run(spark, fetches, [("a", 1000)])
    # gaps: 500 (violation), 1500, 600 (violation)
    assert got["a"] == (4, 500, 1000, 2, False)


def test_exact_delay_gap_is_compliant(spark):
    fetches = [("a", 0), ("a", 1000)]
    got = _run(spark, fetches, [("a", 1000)])
    assert got["a"] == (2, 1000, 1000, 0, True)


def test_no_declared_delay_is_compliant(spark):
    fetches = [("b", 0), ("b", 1)]
    got = _run(spark, fetches, [("a", 1000)])
    assert got["b"] == (2, 1, None, 0, True)


def test_single_fetch_host_null_gap(spark):
    got = _run(spark, [("a", 0)], [("a", 1000)])
    assert got["a"] == (1, None, 1000, 0, True)
