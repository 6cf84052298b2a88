"""Adaptive recrawl scheduling (operators/recrawl.py): Cho &
Garcia-Molina change-rate estimation + interval clamping."""

import datetime as dt
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from spider_spark.operators import recrawl


def _caps(spark, rows):
    return spark.createDataFrame(
        [Row(url=u, ts=t, fp=f, seq=i) for i, (u, t, f) in enumerate(rows)]
    )


def _t(h):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


def test_change_rate_matches_cho_molina_formula(spark):
    # url A: 5 captures hourly, 2 changes; url B: never changes; url C: 1 capture
    rows = [
        ("a", _t(0), "x"),
        ("a", _t(1), "x"),
        ("a", _t(2), "y"),
        ("a", _t(3), "y"),
        ("a", _t(4), "z"),
        ("b", _t(0), "k"),
        ("b", _t(2), "k"),
        ("c", _t(0), "q"),
    ]
    out = {
        r.url: r
        for r in recrawl.change_rate(
            _caps(spark, rows), tiebreak_col="seq"
        ).collect()
    }
    a = out["a"]
    assert (a.n_captures, a.n_changes) == (5, 2)
    # n=4 intervals of 3600 s, X=2: lambda = -ln((4-2+0.5)/(4+0.5))/3600
    assert math.isclose(a.lambda_per_s, -math.log(2.5 / 4.5) / 3600, rel_tol=1e-12)
    b = out["b"]
    assert b.n_changes == 0
    # zero observed changes -> rate exactly 0 (normalized +0.0, not -0.0)
    assert b.lambda_per_s == 0.0 and math.copysign(1, b.lambda_per_s) == 1.0
    c = out["c"]
    assert c.n_captures == 1 and c.lambda_per_s is None


def test_change_rate_orders_by_timestamp_not_input_order(spark):
    # shuffled input: same estimate as sorted input
    rows = [
        ("a", _t(2), "y"),
        ("a", _t(0), "x"),
        ("a", _t(1), "x"),
    ]
    out = recrawl.change_rate(_caps(spark, rows), tiebreak_col="seq").collect()[0]
    assert out.n_changes == 1  # x -> x -> y in time order


def test_recrawl_intervals_clamp_and_null_policy(spark):
    rows = [
        ("fast", _t(0), "a"),
        ("fast", _t(1), "b"),  # changes every capture -> tiny interval
        ("solo", _t(0), "a"),  # no evidence -> max interval
    ]
    rates = recrawl.change_rate(_caps(spark, rows), tiebreak_col="seq")
    out = {
        r.url: r.interval_s
        for r in recrawl.recrawl_intervals(
            rates, min_interval_s=600, max_interval_s=86400
        ).collect()
    }
    # fast: 1/lambda = 3600/ln(1.5/0.5) ~ 3277 s, inside the clamp
    assert math.isclose(out["fast"], 3600 / math.log(1.5 / 0.5), rel_tol=1e-9)
    assert out["solo"] == 86400.0


# --- RFC 9111 server-declared freshness ------------------------------------


def _fresh(spark, rows):
    from spider_spark.operators.recrawl import http_freshness

    df = spark.createDataFrame(
        rows, "url string, cache_control string, expires string, http_date string, last_modified string"
    )
    out = http_freshness(df).collect()
    return {r.url: (r.freshness_s, r.freshness_source) for r in out}


def test_http_freshness_precedence_chain(spark):
    got = _fresh(
        spark,
        [
            # no-store beats an explicit max-age
            ("a", "no-store, max-age=600", None, None, None),
            # no-cache (even qualified) → always revalidate
            ("b", 'private, no-cache="set-cookie", max-age=600', None, None, None),
            # s-maxage wins over max-age for a shared cache
            ("c", "max-age=60, s-maxage=120", None, None, None),
            ("d", "public, max-age=3600", None, None, None),
            # quoted argument form
            ('e', 'max-age="45"', None, None, None),
            # Expires − Date
            ("f", None, "Sun, 06 Nov 1994 09:49:37 GMT", "Sun, 06 Nov 1994 08:49:37 GMT", None),
            # Expires in the past clamps to 0
            ("g", None, "Sun, 06 Nov 1994 07:49:37 GMT", "Sun, 06 Nov 1994 08:49:37 GMT", None),
            # unparseable Expires ('0') is already-stale per §5.3
            ("h", None, "0", "Sun, 06 Nov 1994 08:49:37 GMT", None),
            # heuristic: 10% of (Date − Last-Modified)
            ("i", None, None, "Sun, 06 Nov 1994 08:49:37 GMT", "Sat, 05 Nov 1994 08:49:37 GMT"),
            # nothing declared
            ("j", None, None, None, None),
        ],
    )
    assert got["a"] == (0, "no-store")
    assert got["b"] == (0, "no-cache")
    assert got["c"] == (120, "s-maxage")
    assert got["d"] == (3600, "max-age")
    assert got["e"] == (45, "max-age")
    assert got["f"] == (3600, "expires")
    assert got["g"] == (0, "expires")
    assert got["h"] == (0, "expires")
    assert got["i"] == (8640, "heuristic")
    assert got["j"] == (None, "none")


def test_http_freshness_token_boundaries(spark):
    """Directive tokens must not fire as substrings of longer tokens."""
    got = _fresh(
        spark,
        [
            # stale-while-revalidate is NOT no-cache; s-maxage is NOT max-age
            ("a", "stale-while-revalidate=30, s-maxage=99", None, None, None),
            # pre-no-cache / max-agenda are not directives; heuristic absent
            ("b", "x-no-cachey, max-agenda=5", None, None, None),
            # case-insensitive
            ("c", "Max-Age=77", None, None, None),
            ("d", "NO-STORE", None, None, None),
        ],
    )
    assert got["a"] == (99, "s-maxage")
    assert got["b"] == (None, "none")
    assert got["c"] == (77, "max-age")
    assert got["d"] == (0, "no-store")


def test_http_freshness_private_cache_ignores_smaxage(spark):
    from spider_spark.operators.recrawl import http_freshness

    df = spark.createDataFrame(
        [("u", "max-age=60, s-maxage=120", None, None, None)],
        "url string, cache_control string, expires string, http_date string, last_modified string",
    )
    r = http_freshness(df, shared=False).collect()[0]
    assert (r.freshness_s, r.freshness_source) == (60, "max-age")


def test_http_freshness_heuristic_cap_and_offset_dates(spark):
    got = _fresh(
        spark,
        [
            # 10% of 10 years ≫ cap → capped at 7 days
            ("a", None, None, "Sun, 06 Nov 2004 08:49:37 GMT", "Sat, 06 Nov 1994 08:49:37 GMT"),
            # numeric-offset dates parse under the Z pattern
            ("b", None, "06 Nov 1994 09:49:37 +0000", "06 Nov 1994 08:49:37 +0000", None),
            # Last-Modified AFTER Date clamps to 0, never negative
            ("c", None, None, "Sat, 05 Nov 1994 08:49:37 GMT", "Sun, 06 Nov 1994 08:49:37 GMT"),
        ],
    )
    assert got["a"] == (7 * 24 * 3600, "heuristic")
    assert got["b"] == (3600, "expires")
    assert got["c"] == (0, "heuristic")
