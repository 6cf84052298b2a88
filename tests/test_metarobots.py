"""Robots META directives + rel=nofollow link hygiene (metarobots.py)."""

import datetime

from pyspark.sql import functions as F

from spider_spark import metarobots as mr
from spider_spark.metarobots import (
    col_meta_robots,
    col_rel_nofollow,
    screen_noindex,
)


def _flags(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    r = df.select(col_meta_robots("html").alias("m")).collect()[0]["m"]
    return r["noindex"], r["nofollow"]


def test_meta_robots_variants(spark):
    assert _flags(spark, "<html><p>no meta</p></html>") == (False, False)
    assert _flags(spark, '<meta name="robots" content="noindex">') == (True, False)
    assert _flags(spark, "<meta name='robots' content='nofollow'>") == (False, True)
    assert _flags(spark, '<meta name=robots content="noindex, nofollow">') == (
        True,
        True,
    )
    assert _flags(spark, '<meta name="robots" content="none">') == (True, True)
    assert _flags(spark, '<meta name="robots" content="all">') == (False, False)
    # attribute order reversed; unquoted content value
    assert _flags(spark, '<meta content=noindex name="robots">') == (True, False)
    # case-insensitive everywhere
    assert _flags(spark, '<META NAME="ROBOTS" CONTENT="NOFOLLOW">') == (False, True)
    # multiple robots metas union (most restrictive wins)
    assert _flags(
        spark,
        '<meta name="robots" content="noindex"><meta name="robots" content="nofollow">',
    ) == (True, True)
    # other meta names carry nothing
    assert _flags(spark, '<meta name="viewport" content="noindex">') == (False, False)
    assert _flags(spark, None) == (False, False)


def test_rel_nofollow_tokens(spark):
    rows = [
        ("a", "nofollow"),
        ("b", "external NOFOLLOW"),
        ("c", "ugc"),
        ("d", "sponsored"),
        ("e", "external"),
        ("f", None),
        ("g", ""),
    ]
    df = spark.createDataFrame(rows, "id string, rel string")
    got = {
        r["id"]: r["nf"]
        for r in df.select("id", col_rel_nofollow("rel").alias("nf")).collect()
    }
    assert got == {
        "a": True,
        "b": True,
        "c": True,
        "d": True,
        "e": False,
        "f": False,
        "g": False,
    }


def test_screen_noindex(spark):
    rows = [
        (0, '<meta name="robots" content="noindex"><p>secret</p>'),
        (1, "<p>public</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    kept = [r["doc_id"] for r in screen_noindex(df).collect()]
    assert kept == [1]
    flagged = {
        r["doc_id"]: r["noindex"]
        for r in screen_noindex(df, flag_only=True).collect()
    }
    assert flagged == {0: True, 1: False}


def _crawl(spark, tmp_path, honor, ck):
    from spider_spark import textops
    from spider_spark.crawler import Crawler
    from spider_spark.frontier import CrawlConfig
    from spider_spark.synth import PAGES_SCHEMA

    index_html = (
        "<html><body>"
        '<a href="/plain">p</a>'
        '<a href="/nf" rel="nofollow">n</a>'
        '<a href="/ugc" rel="external ugc">u</a>'
        "</body></html>"
    )
    # page-level nofollow: all its links must be ignored when honoring
    nofollow_page = (
        '<html><head><meta name="robots" content="nofollow"></head>'
        '<body><a href="/hidden1">h</a><a href="/hidden2">h</a></body></html>'
    )
    leaf = "<html><body>leaf</body></html>"
    ts = datetime.datetime(2024, 1, 1)
    pages = {
        "https://m.test/": index_html,
        "https://m.test/plain": nofollow_page,
        "https://m.test/nf": leaf,
        "https://m.test/ugc": leaf,
        "https://m.test/hidden1": leaf,
        "https://m.test/hidden2": leaf,
    }
    rows = [
        (u, ts, h.encode(), textops.strip_html_to_text(h), "en")
        for u, h in pages.items()
    ]
    pages_df = spark.createDataFrame(rows, PAGES_SCHEMA)
    cfg = CrawlConfig(
        per_host_budget=100,
        max_ticks=4,
        honor_meta_robots=honor,
        compact_seen_every=None,
    )
    c = Crawler(spark, pages_df, str(tmp_path / ck), cfg)
    c.run(["https://m.test/"], max_ticks=4)
    fetched = {
        r["url_canon"]
        for r in c.results().filter(F.col("status") == 200).collect()
    }
    return fetched


def test_crawl_honors_meta_robots(spark, tmp_path):
    honored = _crawl(spark, tmp_path, True, "ck_on")
    # rel=nofollow / ugc links never enqueued; page-level nofollow page is
    # itself fetched but contributes no outlinks
    assert honored == {"https://m.test/", "https://m.test/plain"}

    default = _crawl(spark, tmp_path, False, "ck_off")
    # off by default: everything reachable is crawled (reference behavior)
    assert default == set(
        [
            "https://m.test/",
            "https://m.test/plain",
            "https://m.test/nf",
            "https://m.test/ugc",
            "https://m.test/hidden1",
            "https://m.test/hidden2",
        ]
    )


def test_canonical_href_variants(spark):
    from spider_spark.metarobots import col_canonical_href

    rows = [
        (0, '<link rel="canonical" href="https://c.test/a"><link rel="canonical" href="/second">'),
        (1, "<link href='/b' rel='canonical alternate'>"),
        (2, "<link rel=canonical href=/c>"),
        (3, '<link rel="stylesheet" href="/nope.css">'),
        (4, "<p>none</p>"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "i long, html string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", col_canonical_href("html").alias("c")).collect()
    }
    # keep-first in document order
    assert got == {0: "https://c.test/a", 1: "/b", 2: "/c", 3: None, 4: None, 5: None}


def test_meta_refresh_variants(spark):
    from spider_spark.metarobots import col_meta_refresh

    rows = [
        (0, '<meta http-equiv="refresh" content="0; url=/next">'),
        (1, "<meta http-equiv=REFRESH content='5;URL=\"https://r.test/x\"'>"),
        (2, '<meta http-equiv="refresh" content="30">'),  # reload, no url
        (3, "<p>none</p>"),
    ]
    df = spark.createDataFrame(rows, "i long, html string")
    got = {
        r["i"]: (r["m"]["delay"], r["m"]["url"])
        for r in df.select("i", col_meta_refresh("html").alias("m")).collect()
    }
    assert got[0] == (0, "/next")
    assert got[1] == (5, "https://r.test/x")
    assert got[2] == (30, None)
    assert got[3] == (None, None)


def test_ai_optout_flags(spark):
    rows = [
        (0, '<meta name="robots" content="noai">'),
        (1, '<meta name="robots" content="noimageai , index">'),
        (2, '<meta name="tdm-reservation" content="1">'),
        (3, "<meta name='tdm-reservation' content='0'>"),
        (4, '<META NAME=robots CONTENT="NOAI">'),
        (5, '<meta name="robots" content="noindex">'),
        (6, None),
        (7, '<meta name="tdm-reservation" content="yes">'),
        (8, '<meta name="description" content="noai">'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r["doc_id"]: (
            r["noai"], r["noimageai"], r["tdm_reserved"], r["trainable"]
        )
        for r in mr.screen_ai_optout(df).collect()
    }
    assert got[0] == (True, True, False, False)     # noai implies noimageai
    assert got[1] == (False, True, False, True)     # image-only optout: text ok
    assert got[2] == (False, False, True, False)    # TDM reservation
    assert got[3] == (False, False, False, True)    # tdm 0 = not reserved
    assert got[4] == (True, True, False, False)     # case/quoting variants
    assert got[5] == (False, False, False, True)    # noindex is not an AI optout
    assert got[6] == (False, False, False, True)    # null html
    assert got[7] == (False, False, False, True)    # junk tdm value
    assert got[8] == (False, False, False, True)    # wrong meta name


def test_rel_next_href_variants(spark):
    cases = [
        ('<link rel="next" href="/p2">', "/p2"),
        ("<link href='/x' rel='next'>", "/x"),
        ("<LINK REL=NEXT HREF=/y>", "/y"),
        ('<link rel="prev" href="/p0">', None),
        ('<a rel="next" href="/not-a-link-tag">text</a>', None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, html string"
    )
    got = {
        r["i"]: r["nx"]
        for r in df.select(
            "i", mr.col_rel_next_href("html").alias("nx")
        ).collect()
    }
    assert got == {i: want for i, (_, want) in enumerate(cases)}


def test_pagination_chains(spark):
    def page(url, nxt):
        h = f'<link rel="next" href="{nxt}">' if nxt else "<p>end</p>"
        return (url, f"<html><head>{h}</head></html>")

    pages = spark.createDataFrame(
        [
            page("a1", "a2"), page("a2", "a3"), page("a3", None),
            page("b1", "b2"), page("b2", None),
            page("solo", None),
            page("dangle", "missing-page"),  # next points off the store
        ],
        "url string, html string",
    )
    got = {
        r["url"]: (r["chain_id"], r["n_pages"], r["is_head"], r["is_tail"])
        for r in mr.pagination_chains(pages).collect()
    }
    assert got["a1"] == ("a1", 3, True, False)
    assert got["a2"] == ("a1", 3, False, False)
    assert got["a3"] == ("a1", 3, False, True)
    assert got["b1"] == ("b1", 2, True, False)
    assert got["b2"] == ("b1", 2, False, True)
    assert got["solo"] == ("solo", 1, True, True)
    # dangling next-edge binds nothing: singleton, still head+tail
    assert got["dangle"] == ("dangle", 1, True, True)
    assert len(got) == 7
