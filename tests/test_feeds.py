"""RSS 2.0 / Atom feed connector: block extraction (pure Catalyst), CDATA
and entity handling, timestamp leniency, seed keep-first, and feed
autodiscovery from page HTML."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import feeds


RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Site</title><link>https://ex.test/</link>
  <item>
    <title><![CDATA[Hello & <world>]]></title>
    <link>https://ex.test/a?x=1&amp;y=2</link>
    <pubDate>Mon, 02 Jan 2006 15:04:05 GMT</pubDate>
    <guid isPermaLink="false">tag:ex,a</guid>
    <description>first &amp; finest</description>
  </item>
  <item>
    <title>No date</title>
    <link>https://ex.test/b</link>
    <pubDate>not a date</pubDate>
  </item>
  <item><title>linkless — dropped</title></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Feed</title>
  <entry>
    <title>A</title>
    <link rel="self" href="https://ex.test/feed/a.xml"/>
    <link rel="alternate" href="https://ex.test/atom-a"/>
    <id>urn:a</id>
    <published>2006-01-02T15:04:05Z</published>
    <summary>s</summary>
  </entry>
  <entry>
    <title>B</title>
    <link href='https://ex.test/atom-b'/>
    <updated>2007-03-04T05:06:07Z</updated>
  </entry>
</feed>"""


def _feeds_df(spark, rows):
    return spark.createDataFrame(rows, "url string, xml string")


def test_rss_items_extract(spark):
    out = feeds.feed_entries(_feeds_df(spark, [("https://ex.test/rss", RSS)]))
    rows = out.orderBy("pos").collect()
    assert [r.feed_kind for r in rows] == ["rss", "rss"]
    a, b = rows
    assert a.title == "Hello & <world>"  # CDATA verbatim, no entity decode
    assert a.link == "https://ex.test/a?x=1&y=2"  # entity-decoded element text
    assert a.guid == "tag:ex,a"
    assert a.summary == "first & finest"
    assert str(a.published_ts).startswith("2006-01-02")
    assert b.link == "https://ex.test/b"
    assert b.published_raw == "not a date" and b.published_ts is None


def test_atom_entries_extract(spark):
    out = feeds.feed_entries(_feeds_df(spark, [("https://ex.test/atom", ATOM)]))
    rows = out.orderBy("pos").collect()
    assert [r.feed_kind for r in rows] == ["atom", "atom"]
    a, b = rows
    # rel=alternate wins over rel=self regardless of tag order
    assert a.link == "https://ex.test/atom-a"
    assert a.guid == "urn:a" and a.summary == "s"
    assert str(a.published_ts).startswith("2006-01-02")
    # relless link counts as alternate (RFC 4287 §4.2.7.2); single quotes;
    # updated used when published absent
    assert b.link == "https://ex.test/atom-b"
    assert str(b.published_ts).startswith("2007-03-04")


def test_non_feed_documents_produce_no_rows(spark):
    df = _feeds_df(spark, [("u1", "<html><body>hi</body></html>"), ("u2", None)])
    assert feeds.feed_entries(df).count() == 0


def test_feed_seed_urls_keep_newest_claim(spark):
    rss2 = RSS.replace("Mon, 02 Jan 2006", "Tue, 02 Jan 2007")
    df = _feeds_df(
        spark,
        [("https://ex.test/rss-old", RSS), ("https://ex.test/rss-new", rss2)],
    )
    seeds = feeds.feed_seed_urls(feeds.feed_entries(df))
    rows = {r.url: r.published_ts for r in seeds.collect()}
    assert set(rows) == {"https://ex.test/a?x=1&y=2", "https://ex.test/b"}
    assert str(rows["https://ex.test/a?x=1&y=2"]).startswith("2007-01-02")


def test_discover_feed_urls(spark):
    pages = spark.createDataFrame(
        [
            (
                "https://ex.test/page",
                '<html><head>'
                '<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
                "<link href='atom.xml' type='application/atom+xml' rel='alternate'/>"
                '<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
                '<link rel="stylesheet" href="/style.css">'
                "</head></html>",
            ),
            ("https://ex.test/plain", "<html><head></head></html>"),
        ],
        "url string, html string",
    )
    out = feeds.discover_feed_urls(pages).orderBy("feed_url").collect()
    assert [(r.page_url, r.feed_url, r.feed_type) for r in out] == [
        ("https://ex.test/page", "https://ex.test/atom.xml", "application/atom+xml"),
        ("https://ex.test/page", "https://ex.test/feed.xml", "application/rss+xml"),
    ]


def test_discovered_feed_flows_to_frontier_seeds(spark, tmp_path):
    from spider_spark import frontier

    df = _feeds_df(spark, [("https://ex.test/rss", RSS)])
    seeds = feeds.feed_seed_urls(feeds.feed_entries(df)).select("url")
    fr = frontier.seeds_to_frontier(
        spark, [r.url for r in seeds.collect()], frontier.CrawlConfig()
    )
    assert fr.count() == 2
    assert set(fr.select("url_canon").toPandas()["url_canon"]) == {
        "https://ex.test/a?x=1&y=2",
        "https://ex.test/b",
    }
