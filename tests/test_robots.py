"""robots.txt parsing + evaluation (RFC 9309) — scalar semantics, the
Catalyst matcher's parity with the scalar one, the vectorized bodies→rules
path, and the politeness-gate integration (reference treats robots as
caller policy — SPEC.md:254-255 — the engine makes it first-class)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark import synth
from spider_spark.robots import (
    MAX_BYTES,
    col_robots_allowed,
    parse_robots_txt,
    robots_allowed,
    rules_from_bodies,
)

BODY = """
# comment-only line
User-agent: googlebot-news
Disallow: /news-archive/

User-agent: *
Disallow: /private/
Allow: /private/public/
Crawl-delay: 1.5

User-agent: spiderbot
User-agent: otherbot
Disallow: /spider-only/
Allow: /spider-only/ok$
crawl-delay: 2

User-agent: spiderbot
Disallow: /merged/extra/
"""


def test_group_selection_star():
    r = parse_robots_txt(BODY, "somebot")
    assert r.matched_ua == "*"
    assert r.disallow == ["/private/"]
    assert r.allow == ["/private/public/"]
    assert r.crawl_delay_ms == 1500


def test_group_selection_specific_and_merge():
    # spiderbot matches two groups carrying its token; RFC says combine them
    r = parse_robots_txt(BODY, "spiderbot")
    assert r.matched_ua == "spiderbot"
    assert r.disallow == ["/spider-only/", "/merged/extra/"]
    assert r.allow == ["/spider-only/ok$"]
    assert r.crawl_delay_ms == 2000


def test_group_selection_prefix_specificity():
    # UA token is a prefix of the crawler's product token; the longer
    # token wins over '*'
    r = parse_robots_txt(BODY, "googlebot-news-v2")
    assert r.matched_ua == "googlebot-news"
    assert r.disallow == ["/news-archive/"]


def test_multiple_ua_lines_share_one_group():
    r = parse_robots_txt(BODY, "otherbot")
    assert r.disallow == ["/spider-only/"]
    # the second spiderbot group does NOT apply to otherbot
    assert "/merged/extra/" not in r.disallow


def test_rules_before_any_group_ignored_and_empty_disallow():
    body = "Disallow: /orphan/\nUser-agent: *\nDisallow:\nAllow:\n"
    r = parse_robots_txt(body, "any")
    assert r.disallow == [] and r.allow == []


def test_missing_leading_slash_normalized_and_bad_delay():
    body = "User-agent: *\nDisallow: tmp/\nCrawl-delay: soon\n"
    r = parse_robots_txt(body, "x")
    assert r.disallow == ["/tmp/"]
    assert r.crawl_delay_ms is None


def test_no_matching_group_allows_everything():
    body = "User-agent: onlybot\nDisallow: /\n"
    r = parse_robots_txt(body, "spiderbot")
    assert r.matched_ua is None and r.disallow == []
    assert robots_allowed("/anything", r.allow, r.disallow)


def test_hostile_crawl_delay_values_survive():
    # overflow / inf / nan must not crash the parse (one hostile robots.txt
    # among 10^7 hosts must not kill the ingestion job)
    for v in ("inf", "-inf", "nan", "1e306", "9999999999", "soon"):
        r = parse_robots_txt(f"User-agent: *\nCrawl-delay: {v}\n", "x")
        assert r.crawl_delay_ms is None or 0 <= r.crawl_delay_ms <= 2**31 - 1, v
    big = parse_robots_txt("User-agent: *\nCrawl-delay: 9999999999\n", "x")
    assert big.crawl_delay_ms == 2**31 - 1  # clamped, Int32-safe


def test_comment_between_ua_lines_keeps_one_group():
    # RFC 9309 ABNF: emptylines/comments may sit between startgrouplines
    body = "User-agent: abot\n# friendly\n\nUser-agent: bbot\nDisallow: /q\n"
    assert parse_robots_txt(body, "abot").disallow == ["/q"]
    assert parse_robots_txt(body, "bbot").disallow == ["/q"]


def test_repeated_ua_token_does_not_double_rules():
    body = "User-agent: *\nUser-Agent: *\nDisallow: /private/\n"
    assert parse_robots_txt(body, "x").disallow == ["/private/"]


def test_byte_cap():
    huge = "User-agent: *\n" + ("# pad\n" * (MAX_BYTES // 6)) + "Disallow: /late/\n"
    r = parse_robots_txt(huge, "x")
    assert r.disallow == []  # the rule past 512 kB is ignored


# --- longest-match evaluation -------------------------------------------

CASES = [
    ("/private/x", ["/private/public/"], ["/private/"], False),
    ("/private/public/x", ["/private/public/"], ["/private/"], True),
    ("/a", [], [], True),
    ("/fish/salmon", [], ["/fish*"], False),
    ("/fishing", [], ["/fish"], False),
    ("/Fish", [], ["/fish"], True),  # case-sensitive paths
    ("/page.php", [], ["/*.php$"], False),  # $ anchor: path ends in .php ⇒ blocked
    ("/page.php?x=1", [], ["/*.php$"], True),  # query breaks the $ anchor
    ("/x/page.php", [], ["/*.php$"], False),
    ("/dir/sub", ["/dir/sub"], ["/dir/"], True),  # allow longer ⇒ wins
    ("/dir/other", ["/dir/sub"], ["/dir/"], False),
    ("/p", ["/p"], ["/p"], True),  # equal length ⇒ Allow wins (RFC §2.2.2)
    ("/a+b(c)", [], ["/a+b(c)"], False),  # regex metachars treated literally
]


@pytest.mark.parametrize("path,allow,disallow,want", CASES)
def test_scalar_longest_match(path, allow, disallow, want):
    assert robots_allowed(path, allow, disallow) is want


def test_catalyst_matcher_parity_with_scalar(spark):
    rows = [(i, p, a, d) for i, (p, a, d, _) in enumerate(CASES)]
    df = spark.createDataFrame(
        rows, "i int, path string, allow array<string>, disallow array<string>"
    )
    got = {
        r["i"]: r["ok"]
        for r in df.select(
            "i", col_robots_allowed(F.col("path"), F.col("allow"), F.col("disallow")).alias("ok")
        ).collect()
    }
    for i, (p, a, d, want) in enumerate(CASES):
        assert got[i] is want, f"{p} allow={a} disallow={d}"


def test_catalyst_matcher_null_arrays_allow(spark):
    df = spark.createDataFrame([("/x",)], "path string")
    out = df.select(
        col_robots_allowed(F.col("path"), F.lit(None).cast("array<string>"), F.lit(None).cast("array<string>")).alias("ok")
    ).collect()
    assert out[0]["ok"] is True


# --- vectorized bodies → rules + gate integration ------------------------


def test_rules_from_bodies_matches_pre_parsed_rules(spark):
    n = 30
    bodies = synth.generate_robots_txt(spark, n)
    parsed = rules_from_bodies(bodies, user_agent="anybot").orderBy("host")
    expected = synth.generate_robots(spark, n).orderBy("host")
    p = [(r.host, r.disallow_prefixes, r.crawl_delay_ms) for r in parsed.collect()]
    e = [(r.host, r.disallow_prefixes, r.crawl_delay_ms) for r in expected.collect()]
    assert p == e
    # the greedybot group never leaks into the '*' parse
    assert all(r.allow_prefixes == [] for r in parsed.collect())


def test_crawl_with_parsed_robots_equals_pre_parsed(spark, tmp_path):
    """End-to-end: a crawl gated by rules parsed from robots.txt bodies
    blocks exactly what the hand-built rules table blocks."""
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig

    n_pages, n_hosts = 400, 12
    pages = synth.generate_pages(spark, n_pages, n_hosts=n_hosts)
    seeds = synth.seed_urls(n_pages, n_hosts)
    cfg = dict(per_host_budget=8, max_ticks=2)

    rules = rules_from_bodies(synth.generate_robots_txt(spark, n_hosts), "anybot")
    c1 = Crawler(spark, pages, str(tmp_path / "a"), CrawlConfig(**cfg), robots=rules)
    c1.run(seeds, max_ticks=2)
    c2 = Crawler(
        spark, pages, str(tmp_path / "b"), CrawlConfig(**cfg),
        robots=synth.generate_robots(spark, n_hosts),
    )
    c2.run(seeds, max_ticks=2)

    s1 = sorted(r.url_canon for r in c1.results().select("url_canon").collect())
    s2 = sorted(r.url_canon for r in c2.results().select("url_canon").collect())
    assert s1 == s2 and len(s1) > 0


def test_ai_crawler_policy(spark):
    from spider_spark.robots import ai_crawler_policy

    bodies = spark.createDataFrame(
        [
            # blanket AI-bot blocks, humans-era style
            ("blocked.example",
             "User-agent: GPTBot\nDisallow: /\n\n"
             "User-agent: ClaudeBot\nDisallow: /\n\n"
             "User-agent: *\nDisallow: /private/\n"),
            # Google-Extended opt-out only; everyone else default group
            ("gext.example",
             "User-agent: Google-Extended\nDisallow: /\n\n"
             "User-agent: *\nAllow: /\n"),
            # no robots at all -> unavailable = allow
            ("open.example", None),
            # specific group ALLOWS root while * disallows: specific wins
            ("carveout.example",
             "User-agent: CCBot\nAllow: /\n\n"
             "User-agent: *\nDisallow: /\n"),
        ],
        "host string, robots_txt string",
    )
    got = {
        (r["host"], r["agent"]): r["root_allowed"]
        for r in ai_crawler_policy(bodies).collect()
    }
    assert got[("blocked.example", "GPTBot")] is False
    assert got[("blocked.example", "ClaudeBot")] is False
    # agents without their own group fall to *, which allows /
    assert got[("blocked.example", "CCBot")] is True
    assert got[("gext.example", "Google-Extended")] is False
    assert got[("gext.example", "GPTBot")] is True
    assert all(got[("open.example", ua)] for ua in
               ("GPTBot", "ClaudeBot", "Google-Extended", "CCBot",
                "Applebot-Extended"))
    assert got[("carveout.example", "CCBot")] is True
    assert got[("carveout.example", "GPTBot")] is False
    assert len(got) == 4 * 5
