"""RSS 2.0 / Atom feed ingestion: feed XML → entry rows → frontier seeds,
pure Catalyst, plus feed DISCOVERY from fetched pages' ``<link
rel="alternate">`` tags.

The reference discovers URLs only from page links (src/shared/links.ts);
a production crawl also watches the hosts' own publish streams. Feeds are
the sitemap's fast-moving sibling — sitemaps declare the inventory, feeds
announce the deltas — so this module mirrors ``sitemap.py``'s design:
rigid-XML block extraction with ``regexp_extract_all`` in whole-stage
codegen (no Python in the parse path, scan-speed over any number of feed
bodies), the 5 predefined XML entities unescaped ``&amp;``-last, CDATA
sections unwrapped (their content is literal text, NOT entity-decoded —
that's the point of CDATA).

Formats per the public specs:
- RSS 2.0 (cyber.harvard.edu/rss): ``<item>`` blocks; ``<link>`` is
  element TEXT; timestamps are RFC 822 ``pubDate``.
- Atom (RFC 4287): ``<entry>`` blocks; ``<link>`` is an ``href``
  ATTRIBUTE with ``rel="alternate"`` preferred (§4.2.7.2: absent rel
  means alternate); timestamps are RFC 3339 ``published``/``updated``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sitemap import xml_unescape

_ITEM_BLOCK = r"(?s)<item[\s>](.*?)</item>"
_ENTRY_BLOCK = r"(?s)<entry[\s>](.*?)</entry>"
_CDATA = r"(?s)^\s*<!\[CDATA\[(.*?)\]\]>\s*$"

#: RFC 822 as RSS uses it in the wild ("Mon, 02 Jan 2006 15:04:05 GMT" /
#: "+0000"). Spark bans week-based pattern letters ('E') in PARSING, so the
#: optional leading day name is stripped first; zone names ('GMT', 'UT')
#: parse under zzz, numeric offsets under Z — coalesce both. RFC 3339
#: (Atom) parses with Spark's default try_to_timestamp.
_RFC822_ZONE = "dd MMM yyyy HH:mm:ss zzz"
_RFC822_OFFSET = "dd MMM yyyy HH:mm:ss Z"
_DAY_PREFIX = r"^\s*[A-Za-z]{3},\s*"


def _text(block: Column, tag: str) -> Column:
    """<tag>…</tag> body: CDATA unwrapped verbatim, otherwise XML-entity
    decoded; empty → NULL."""
    raw = F.regexp_extract(block, rf"(?s)<{tag}(?:\s[^>]*)?>\s*(.*?)\s*</{tag}>", 1)
    cdata = F.regexp_extract(raw, _CDATA, 1)
    val = F.when(raw.rlike(_CDATA), cdata).otherwise(xml_unescape(raw))
    return F.nullif(val, F.lit(""))


def _atom_link(block: Column) -> Column:
    """First alternate link's href: among the block's <link …> tags, those
    with rel="alternate" OR no rel attribute qualify (RFC 4287 §4.2.7.2);
    document order wins; href may be single- or double-quoted."""
    tags = F.regexp_extract_all(block, F.lit(r"(?s)<link\b([^>]*?)/?>"), F.lit(1))
    alt = F.filter(
        tags,
        lambda t: (~t.rlike(r"""\brel\s*=\s*["']""")) | t.rlike(r"""\brel\s*=\s*["']alternate["']"""),
    )
    first = F.element_at(F.coalesce(F.nullif(alt, F.array().cast("array<string>")), tags), 1)
    href = F.coalesce(
        F.nullif(F.regexp_extract(first, r"""\bhref\s*=\s*"([^"]*)\"""", 1), F.lit("")),
        F.nullif(F.regexp_extract(first, r"""\bhref\s*=\s*'([^']*)'""", 1), F.lit("")),
    )
    return xml_unescape(href)


def feed_entries(df: DataFrame, xml_col: str = "xml", id_cols: tuple[str, ...] = ("url",)) -> DataFrame:
    """Explode feed XML bodies into one row per item/entry.

    Output: ``*id_cols, feed_kind ('rss'|'atom'), pos (document order),
    title, link, published_raw, published_ts, guid, summary``. Rows
    without a link are dropped (nothing to crawl); non-feed documents
    produce no rows. ``published_ts`` parses RFC 822 (RSS) and RFC 3339
    (Atom) leniently — unparseable dates keep the raw string and a NULL
    timestamp, never abort the scan (try_to_timestamp throughout)."""
    xml = F.col(xml_col)
    kind = (
        F.when(xml.rlike(r"(?s)<rss[\s>]"), F.lit("rss"))
        .when(xml.rlike(r"(?s)<feed[\s>]"), F.lit("atom"))
        .otherwise(F.lit(None).cast("string"))
    )
    blocks = (
        F.when(kind == "rss", F.regexp_extract_all(xml, F.lit(_ITEM_BLOCK), F.lit(1)))
        .when(kind == "atom", F.regexp_extract_all(xml, F.lit(_ENTRY_BLOCK), F.lit(1)))
        .otherwise(F.array().cast("array<string>"))
    )
    b = df.select(
        *id_cols,
        kind.alias("feed_kind"),
        F.posexplode(blocks).alias("pos", "_block"),
    )
    blk = F.col("_block")
    is_rss = F.col("feed_kind") == "rss"
    link = F.when(is_rss, _text(blk, "link")).otherwise(_atom_link(blk))
    published_raw = F.when(is_rss, _text(blk, "pubDate")).otherwise(
        F.coalesce(_text(blk, "published"), _text(blk, "updated"))
    )
    no_day = F.regexp_replace(published_raw, _DAY_PREFIX, "")
    published_ts = F.coalesce(
        F.try_to_timestamp(published_raw),
        F.try_to_timestamp(no_day, F.lit(_RFC822_ZONE)),
        F.try_to_timestamp(no_day, F.lit(_RFC822_OFFSET)),
    )
    guid = F.when(is_rss, _text(blk, "guid")).otherwise(_text(blk, "id"))
    summary = F.when(is_rss, _text(blk, "description")).otherwise(_text(blk, "summary"))
    return (
        b.select(
            *id_cols,
            "feed_kind",
            "pos",
            _text(blk, "title").alias("title"),
            link.alias("link"),
            published_raw.alias("published_raw"),
            published_ts.alias("published_ts"),
            guid.alias("guid"),
            summary.alias("summary"),
        )
        .filter(F.col("link").isNotNull())
    )


def feed_seed_urls(entries: DataFrame) -> DataFrame:
    """Frontier-ready seeds from extracted entries: keep-first per link
    (newest published_ts wins, document order breaks ties — a URL
    announced by several feeds gets its freshest claim). Returns
    ``(url, published_ts)`` — feed ``url`` to ``frontier.seeds_to_frontier``
    (which canonicalizes, hashes, and dead-letters invalid rows)."""
    from pyspark.sql import Window

    w = Window.partitionBy("link").orderBy(F.desc_nulls_last("published_ts"), "pos")
    return (
        entries.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("link").alias("url"), "published_ts")
    )


#: <link rel="alternate" type="…"> MIME types that announce a feed
FEED_MIME_TYPES = ("application/rss+xml", "application/atom+xml")


def discover_feed_urls(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Feed autodiscovery (the RSS-autodiscovery convention): pages'
    ``<link … type="application/rss+xml|atom+xml" … href=…>`` tags →
    ``(page_url, feed_url, feed_type)``, hrefs resolved against the page
    URL with the engine's own WHATWG resolver (``udfs.resolve_href``,
    Arrow-vectorized — the ONLY Python in the path, and only over the few
    rows that declared a feed). Keep-first on resolved feed_url per page.
    Attribute order is free (type before or after href); quotes single or
    double."""
    from . import udfs

    tags = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(r"(?is)<link\b([^>]*?)/?>"), F.lit(1)
    )
    feedish = F.filter(
        tags,
        lambda t: t.rlike(
            r"""(?i)\btype\s*=\s*["'](?:application/rss\+xml|application/atom\+xml)["']"""
        ),
    )
    exploded = pages.select(
        F.col(url_col).alias("page_url"), F.posexplode(feedish).alias("pos", "_tag")
    )
    t = F.col("_tag")
    href = F.coalesce(
        F.nullif(F.regexp_extract(t, r"""(?i)\bhref\s*=\s*"([^"]*)\"""", 1), F.lit("")),
        F.nullif(F.regexp_extract(t, r"""(?i)\bhref\s*=\s*'([^']*)'""", 1), F.lit("")),
    )
    ftype = F.lower(
        F.regexp_extract(t, r"""(?i)\btype\s*=\s*["'](application/(?:rss|atom)\+xml)["']""", 1)
    )
    cand = exploded.select(
        "page_url",
        "pos",
        xml_unescape(href).alias("_href"),
        ftype.alias("feed_type"),
    ).filter(F.col("_href").isNotNull())
    resolved = cand.withColumn(
        "feed_url", udfs.resolve_href(F.col("_href"), F.col("page_url"))
    ).filter(F.col("feed_url").isNotNull())
    from pyspark.sql import Window

    w = Window.partitionBy("page_url", "feed_url").orderBy("pos")
    return (
        resolved.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("page_url", "feed_url", "feed_type")
    )
