"""robots.txt policy drift between recrawl waves (robots.robots_policy_diff)."""

from __future__ import annotations

from spider_spark import robots as rb


def _rules(spark, bodies):
    df = spark.createDataFrame(bodies, "host string, robots_txt string")
    return rb.rules_from_bodies(df)


def _probes(spark, rows):
    return spark.createDataFrame(rows, "host string, path string")


def _run(spark, old, new, probes):
    out = rb.robots_policy_diff(
        _rules(spark, old), _rules(spark, new), _probes(spark, probes)
    )
    return {
        (r["host"], r["path"]): (
            r["allowed_old"],
            r["allowed_new"],
            r["crawl_delay_ms_old"],
            r["crawl_delay_ms_new"],
            r["verdict"],
        )
        for r in out.collect()
    }


def test_four_verdicts(spark):
    old = [
        ("a", "User-agent: *\nDisallow: /x/"),
        ("b", "User-agent: *\nDisallow: /y/"),
    ]
    new = [
        ("a", "User-agent: *\nDisallow: /y/"),
        ("b", "User-agent: *\nDisallow: /y/"),
    ]
    probes = [
        ("a", "/x/page"),  # denied -> allowed
        ("a", "/y/page"),  # allowed -> denied
        ("a", "/z/page"),  # allowed -> allowed
        ("b", "/y/page"),  # denied -> denied
    ]
    got = _run(spark, old, new, probes)
    assert got[("a", "/x/page")][4] == "newly_allowed"
    assert got[("a", "/y/page")][4] == "newly_denied"
    assert got[("a", "/z/page")][4] == "still_allowed"
    assert got[("b", "/y/page")][4] == "still_denied"


def test_missing_host_means_all_allowed(spark):
    old = [("gone", "User-agent: *\nDisallow: /")]
    new = [("fresh", "User-agent: *\nDisallow: /")]
    probes = [("gone", "/p"), ("fresh", "/p"), ("never", "/p")]
    got = _run(spark, old, new, probes)
    # robots vanished -> everything newly allowed
    assert got[("gone", "/p")][:2] == (False, True)
    assert got[("gone", "/p")][4] == "newly_allowed"
    # robots appeared -> newly denied
    assert got[("fresh", "/p")][:2] == (True, False)
    assert got[("fresh", "/p")][4] == "newly_denied"
    # never had robots -> still allowed
    assert got[("never", "/p")][4] == "still_allowed"


def test_crawl_delay_columns_surface_change(spark):
    old = [("a", "User-agent: *\nCrawl-delay: 1\nDisallow: /none/")]
    new = [("a", "User-agent: *\nCrawl-delay: 2.5\nDisallow: /none/")]
    got = _run(spark, old, new, [("a", "/p")])
    assert got[("a", "/p")][2] == 1000
    assert got[("a", "/p")][3] == 2500
    assert got[("a", "/p")][4] == "still_allowed"


def test_longest_match_and_allow_tiebreak_respected(spark):
    # Allow more specific than Disallow in the NEW snapshot flips access
    old = [("a", "User-agent: *\nDisallow: /docs/")]
    new = [("a", "User-agent: *\nDisallow: /docs/\nAllow: /docs/public")]
    probes = [("a", "/docs/public/x"), ("a", "/docs/private/x")]
    got = _run(spark, old, new, probes)
    assert got[("a", "/docs/public/x")][4] == "newly_allowed"
    assert got[("a", "/docs/private/x")][4] == "still_denied"


def test_wildcard_and_anchor_patterns(spark):
    old = [("a", "User-agent: *\nDisallow: /a/*.pdf$")]
    new = [("a", "User-agent: *\nDisallow: ")]
    probes = [("a", "/a/x.pdf"), ("a", "/a/x.pdfz")]
    got = _run(spark, old, new, probes)
    assert got[("a", "/a/x.pdf")][4] == "newly_allowed"
    assert got[("a", "/a/x.pdfz")][4] == "still_allowed"
