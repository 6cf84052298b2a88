"""Robots META directives + rel=nofollow link hygiene.

The reference captures each link's ``rel`` attribute verbatim
(src/shared/types.ts:46, links.ts Link.rel) but never acts on it; a
crawl-tier engine must, or it re-enqueues everything publishers asked it
not to follow. This module implements the two standard in-page robots
surfaces (Google/Bing documented semantics, robots-meta-tag spec):

- ``<meta name="robots" content="noindex, nofollow">`` — page-level:
  ``noindex`` excludes the page's TEXT from corpus export, ``nofollow``
  drops ALL its outlinks from the frontier. ``none`` ≡ both; ``all`` ≡
  neither; multiple robots metas union (most restrictive wins).
- ``rel="nofollow"`` (also ``ugc``/``sponsored``, which imply nofollow
  for crawling purposes) — link-level: that one link is not enqueued.

Everything here is pure Catalyst (higher-order functions over
regexp_extract_all) — no UDF, no shuffle; the page-level flags are one
codegen projection over the html the parse stage already holds, and the
link-level check is a filter inside the existing link explode. Patterns
are restricted to the Java↔RE2-identical syntax subset so the DuckDB
oracle evaluates the SAME regexes (the PII-masking discipline,
operators/curation.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one <meta ...> tag (case-insensitive); [^>]* keeps it linear-time
_META_TAG_RE = "(?i)<meta\\b[^>]*>"
# name attribute names the robots processor this tag addresses
_NAME_ROBOTS_RE = "(?i)\\bname\\s*=\\s*[\"']?robots\\b"
# content attribute, three quoting styles (group 1 = the value)
_CONTENT_DQ_RE = "(?i)\\bcontent\\s*=\\s*\"([^\"]*)\""
_CONTENT_SQ_RE = "(?i)\\bcontent\\s*=\\s*'([^']*)'"
_CONTENT_UQ_RE = "(?i)\\bcontent\\s*=\\s*([^\\s\"'>]+)"


def _meta_content_tokens(html: Column) -> Column:
    """All directive tokens across every ``<meta name=robots>`` tag:
    content values split on commas, trimmed, lowercased."""
    metas = F.regexp_extract_all(html, F.lit(_META_TAG_RE), F.lit(0))
    robots = F.filter(metas, lambda m: m.rlike(_NAME_ROBOTS_RE))
    content = lambda m: F.lower(  # noqa: E731 - local expression builder
        F.coalesce(
            F.nullif(F.regexp_extract(m, _CONTENT_DQ_RE, 1), F.lit("")),
            F.nullif(F.regexp_extract(m, _CONTENT_SQ_RE, 1), F.lit("")),
            F.nullif(F.regexp_extract(m, _CONTENT_UQ_RE, 1), F.lit("")),
            F.lit(""),
        )
    )
    tokens = F.flatten(
        F.transform(robots, lambda m: F.split(content(m), ","))
    )
    return F.transform(tokens, lambda t: F.trim(t))


def col_meta_robots(html: Column | str) -> Column:
    """html → struct(noindex boolean, nofollow boolean). Null html ⇒
    (false, false) — absent content carries no directives."""
    h = F.col(html) if isinstance(html, str) else html
    toks = _meta_content_tokens(F.coalesce(h, F.lit("")))
    noindex = F.exists(toks, lambda t: (t == "noindex") | (t == "none"))
    nofollow = F.exists(toks, lambda t: (t == "nofollow") | (t == "none"))
    return F.struct(noindex.alias("noindex"), nofollow.alias("nofollow"))


def col_rel_nofollow(rel: Column | str) -> Column:
    """rel attribute (space-separated token list, HTML spec) → true when
    the link must not be followed: nofollow, or the ugc/sponsored
    refinements that imply it for crawling. Null/absent rel ⇒ false."""
    r = F.col(rel) if isinstance(rel, str) else rel
    toks = F.split(F.lower(F.trim(F.coalesce(r, F.lit("")))), "\\s+")
    return F.exists(
        toks, lambda t: (t == "nofollow") | (t == "ugc") | (t == "sponsored")
    )


def screen_noindex(
    pages: DataFrame, html_col: str = "html", flag_only: bool = False
) -> DataFrame:
    """Corpus-export hygiene: drop (or, with ``flag_only``, mark) pages
    whose robots meta says ``noindex``. Map-only projection/filter — run
    it in the export job, where the html column is being read anyway."""
    flag = col_meta_robots(F.col(html_col)).getField("noindex")
    if flag_only:
        return pages.withColumn("noindex", flag)
    return pages.filter(~flag)


# one <link ...> tag; rel attribute may list multiple space-separated
# tokens ("canonical alternate"), so match the token not the literal value
_LINK_TAG_RE = "(?i)<link\\b[^>]*>"
_REL_CANONICAL_RE = "(?i)\\brel\\s*=\\s*[\"']?[^\"'>]*\\bcanonical\\b"
_HREF_DQ_RE = "(?i)\\bhref\\s*=\\s*\"([^\"]*)\""
_HREF_SQ_RE = "(?i)\\bhref\\s*=\\s*'([^']*)'"
_HREF_UQ_RE = "(?i)\\bhref\\s*=\\s*([^\\s\"'>]+)"

_EQUIV_REFRESH_RE = "(?i)\\bhttp-equiv\\s*=\\s*[\"']?refresh\\b"
# content="5; url=/next" — delay integer, then an optional url= part whose
# value may be quoted; the quotes are NOT part of the URL
_REFRESH_DELAY_RE = "^\\s*([0-9]+)"
_REFRESH_URL_RE = "(?i)url\\s*=\\s*[\"']?([^\"'\\s>]+)"


def _first_attr(tag: Column, dq: str, sq: str, uq: str) -> Column:
    return F.coalesce(
        F.nullif(F.regexp_extract(tag, dq, 1), F.lit("")),
        F.nullif(F.regexp_extract(tag, sq, 1), F.lit("")),
        F.nullif(F.regexp_extract(tag, uq, 1), F.lit("")),
    )


def col_canonical_href(html: Column | str) -> Column:
    """html → the FIRST ``<link rel=canonical>`` href in document order
    (the dedup/cluster signal search engines honor), or null. The href is
    returned raw — resolve it against the page's final URL with the same
    WHATWG resolver links go through (urlops.resolve_href) when an
    absolute form is needed."""
    h = F.col(html) if isinstance(html, str) else html
    tags = F.regexp_extract_all(F.coalesce(h, F.lit("")), F.lit(_LINK_TAG_RE), F.lit(0))
    canon = F.filter(tags, lambda t: t.rlike(_REL_CANONICAL_RE))
    hrefs = F.transform(
        canon, lambda t: _first_attr(t, _HREF_DQ_RE, _HREF_SQ_RE, _HREF_UQ_RE)
    )
    nonnull = F.filter(hrefs, lambda x: x.isNotNull())
    return F.get(nonnull, 0)


def col_meta_refresh(html: Column | str) -> Column:
    """html → struct(delay int, url string) from the FIRST
    ``<meta http-equiv=refresh>`` tag, or (null, null). A zero/low-delay
    refresh with a url is a client-side redirect — crawl engines treat it
    like a 3xx hop (the reference's redirect chase handles only HTTP
    redirects; this surfaces the in-page kind so the frontier can follow
    or cap them)."""
    h = F.col(html) if isinstance(html, str) else html
    metas = F.regexp_extract_all(
        F.coalesce(h, F.lit("")), F.lit(_META_TAG_RE), F.lit(0)
    )
    refresh = F.filter(metas, lambda m: m.rlike(_EQUIV_REFRESH_RE))
    first = F.get(refresh, 0)
    content = _first_attr(first, _CONTENT_DQ_RE, _CONTENT_SQ_RE, _CONTENT_UQ_RE)
    delay = F.nullif(F.regexp_extract(content, _REFRESH_DELAY_RE, 1), F.lit("")).cast(
        "int"
    )
    url = F.nullif(F.regexp_extract(content, _REFRESH_URL_RE, 1), F.lit(""))
    return F.struct(delay.alias("delay"), url.alias("url"))


# --- hreflang alternates (international-SEO language clusters) -------------

_REL_ALTERNATE_RE = "(?i)\\brel\\s*=\\s*[\"']?[^\"'>]*\\balternate\\b"
_HREFLANG_DQ_RE = "(?i)\\bhreflang\\s*=\\s*\"([^\"]*)\""
_HREFLANG_SQ_RE = "(?i)\\bhreflang\\s*=\\s*'([^']*)'"
_HREFLANG_UQ_RE = "(?i)\\bhreflang\\s*=\\s*([^\\s\"'>]+)"


def col_hreflang_links(html: Column | str) -> Column:
    """html → array<struct<lang, href>> of every
    ``<link rel=alternate hreflang=...>`` in document order — the
    language-variant declarations that group a page with its
    translations (Google's hreflang contract). Lang is lowercased
    (BCP 47 tags are case-insensitive); hrefs are raw like
    ``col_canonical_href``. Tags missing either attribute are dropped.
    Pure codegen: one tag scan + per-tag attr extracts."""
    h = F.col(html) if isinstance(html, str) else html
    tags = F.regexp_extract_all(
        F.coalesce(h, F.lit("")), F.lit(_LINK_TAG_RE), F.lit(0)
    )
    alts = F.filter(tags, lambda t: t.rlike(_REL_ALTERNATE_RE))
    pairs = F.transform(
        alts,
        lambda t: F.struct(
            F.lower(
                _first_attr(t, _HREFLANG_DQ_RE, _HREFLANG_SQ_RE, _HREFLANG_UQ_RE)
            ).alias("lang"),
            _first_attr(t, _HREF_DQ_RE, _HREF_SQ_RE, _HREF_UQ_RE).alias("href"),
        ),
    )
    return F.filter(
        pairs, lambda p: p["lang"].isNotNull() & p["href"].isNotNull()
    )


def hreflang_reciprocity(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """The hreflang audit every international crawl runs: extract all
    (src, lang, dst) alternate declarations and flag whether each is
    RECIPROCATED (some declaration on dst points back at src — Google
    ignores non-reciprocal hreflang, so these rows are the broken ones
    to report). Self-referencing declarations (src == dst, the
    recommended practice) are trivially reciprocal.

    Physical shape: one codegen extraction pass → explode; reciprocity
    is one left-semi-shaped join of the edge set against its own
    reversal on the (src, dst) pair key — shuffle ∝ declared edges
    (pages declare a handful of alternates each), never pages².
    Returns (src, lang, dst, reciprocal)."""
    h = F.col(html_col)
    edges = pages.select(
        F.col(url_col).alias("src"),
        F.explode(col_hreflang_links(h)).alias("e"),
    ).select("src", F.col("e.lang").alias("lang"), F.col("e.href").alias("dst"))
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    ).distinct().withColumn("_back", F.lit(1))
    return (
        edges.join(rev, ["src", "dst"], "left")
        .select(
            "src",
            "lang",
            "dst",
            (F.col("_back").isNotNull() | (F.col("src") == F.col("dst"))).alias(
                "reciprocal"
            ),
        )
    )


# TDM Reservation Protocol (W3C TDMRep CG final report) meta names, plus
# the de-facto "noai"/"noimageai" robots tokens publishers adopted for
# ML-training opt-out. Same Java↔RE2-identical regex subset as above.
_NAME_TDM_RES_RE = "(?i)\\bname\\s*=\\s*[\"']?tdm-reservation\\b"
_NAME_TDM_POL_RE = "(?i)\\bname\\s*=\\s*[\"']?tdm-policy\\b"


def _named_meta_contents(html: Column, name_re: str) -> Column:
    """content values (lowercased, trimmed) of every <meta> whose name
    matches ``name_re`` — the robots-token extractor generalized to any
    meta name."""
    metas = F.regexp_extract_all(html, F.lit(_META_TAG_RE), F.lit(0))
    named = F.filter(metas, lambda m: m.rlike(name_re))
    content = lambda m: F.lower(  # noqa: E731 - local expression builder
        F.coalesce(
            F.nullif(F.regexp_extract(m, _CONTENT_DQ_RE, 1), F.lit("")),
            F.nullif(F.regexp_extract(m, _CONTENT_SQ_RE, 1), F.lit("")),
            F.nullif(F.regexp_extract(m, _CONTENT_UQ_RE, 1), F.lit("")),
            F.lit(""),
        )
    )
    return F.transform(named, lambda m: F.trim(content(m)))


def col_ai_optout(html: Column | str) -> Column:
    """html → struct(noai, noimageai, tdm_reserved booleans) — the
    machine-learning-training opt-out surfaces a responsible corpus
    pipeline must honor BEFORE export (the compliance sibling of
    `col_meta_robots`'s noindex):

    - ``noai`` / ``noimageai`` robots-meta tokens (the de-facto
      convention DeviantArt et al. shipped in 2022; ``noai`` implies
      ``noimageai``),
    - ``<meta name="tdm-reservation" content="1">`` — the W3C TDM
      Reservation Protocol (TDMRep) in-page opt-out; any value other
      than literal '1' (incl. '0', absent, junk) is NOT a reservation.

    Null html ⇒ all false (absent content carries no directives). Pure
    Catalyst projection, RE2-safe regexes — oracle-replayable."""
    h = F.col(html) if isinstance(html, str) else html
    safe = F.coalesce(h, F.lit(""))
    rob = _meta_content_tokens(safe)
    noai = F.exists(rob, lambda t: t == "noai")
    noimg = noai | F.exists(rob, lambda t: t == "noimageai")
    tdm = F.exists(
        _named_meta_contents(safe, _NAME_TDM_RES_RE), lambda v: v == "1"
    )
    return F.struct(
        noai.alias("noai"),
        noimg.alias("noimageai"),
        tdm.alias("tdm_reserved"),
    )


def screen_ai_optout(
    pages: DataFrame, html_col: str = "html"
) -> DataFrame:
    """Input columns + (noai, noimageai, tdm_reserved, trainable) —
    ``trainable`` = no text-training opt-out surface present (noai or a
    TDM reservation; noimageai alone still permits TEXT training, it
    scopes to images). The export-gate column a curation pipeline
    filters on, map-only over the page store."""
    flags = col_ai_optout(F.col(html_col))
    return (
        pages.withColumn("_ai", flags)
        .withColumn("noai", F.col("_ai.noai"))
        .withColumn("noimageai", F.col("_ai.noimageai"))
        .withColumn("tdm_reserved", F.col("_ai.tdm_reserved"))
        .withColumn(
            "trainable", ~(F.col("noai") | F.col("tdm_reserved"))
        )
        .drop("_ai")
    )


_REL_NEXT_RE = "(?i)\\brel\\s*=\\s*[\"']?[^\"'>]*\\bnext\\b"
_REL_PREV_RE = "(?i)\\brel\\s*=\\s*[\"']?[^\"'>]*\\bprev(ious)?\\b"


def col_rel_next_href(html: Column | str) -> Column:
    """html → the FIRST ``<link rel=next>`` href in document order (the
    pagination forward pointer Google's crawler consumed for years), or
    null. Raw href — resolve with urlops.resolve_href as needed; same
    tag machinery as `col_canonical_href`."""
    h = F.col(html) if isinstance(html, str) else html
    tags = F.regexp_extract_all(
        F.coalesce(h, F.lit("")), F.lit(_LINK_TAG_RE), F.lit(0)
    )
    nxt = F.filter(tags, lambda t: t.rlike(_REL_NEXT_RE))
    hrefs = F.transform(
        nxt, lambda t: _first_attr(t, _HREF_DQ_RE, _HREF_SQ_RE, _HREF_UQ_RE)
    )
    return F.get(F.filter(hrefs, lambda x: x.isNotNull()), 0)


def pagination_chains(
    pages: DataFrame,
    id_col: str = "url",
    html_col: str = "html",
    max_iters: int = 20,
) -> DataFrame:
    """Assemble multi-page pagination chains from ``rel=next`` pointers:
    (url, chain_id, n_pages, is_head, is_tail). A paginated article's
    pages 2..N must not enter the corpus as N independent documents —
    the chain id is the merge key (concatenate, or keep the head and
    drop the tail pages), and the crawler's dedup/priority layers get
    one identity per logical document.

    chain_id = the smallest member url (the `graph.connected_components`
    min-label convention — CC handles malformed chains: forks, merges,
    next-pointers into another chain). is_head = no inbound next-edge,
    is_tail = no outbound — both straight degree censuses. Pages with no
    rel=next and no inbound pointer form singleton chains (n_pages 1,
    head and tail at once). Edges whose target was never crawled (the
    next pointer dangles off the page store) still bind: CC runs on the
    edge set restricted to crawled pages via the inner join back to
    ``pages``.

    Physical shape: one codegen projection (the rel=next extraction),
    one self-equi-join to keep edges between crawled pages, CC's
    O(log diameter) pointer-doubling sweeps, two degree censuses joined
    back — all shuffles keyed on the url."""
    from .operators.graph import connected_components

    p = pages.select(
        F.col(id_col).alias("url"),
        col_rel_next_href(F.col(html_col)).alias("next_url"),
    ).persist()
    nodes = p.select("url")
    edges = (
        p.filter(F.col("next_url").isNotNull())
        .select(F.col("url").alias("src"), F.col("next_url").alias("dst"))
        .join(nodes.select(F.col("url").alias("dst")), "dst")
    )
    cc = connected_components(edges, max_iters=max_iters)
    labeled = (
        nodes.join(
            cc.select(F.col("node").alias("url"), "component"), "url", "left"
        )
        .withColumn("chain_id", F.coalesce("component", F.col("url")))
        .drop("component")
    )
    outd = edges.groupBy(F.col("src").alias("url")).agg(
        F.count(F.lit(1)).alias("_out")
    )
    ind = edges.groupBy(F.col("dst").alias("url")).agg(
        F.count(F.lit(1)).alias("_in")
    )
    sizes = labeled.groupBy("chain_id").agg(
        F.count(F.lit(1)).alias("n_pages")
    )
    out = (
        labeled.join(outd, "url", "left")
        .join(ind, "url", "left")
        .join(sizes, "chain_id")
        .select(
            "url",
            "chain_id",
            "n_pages",
            F.col("_in").isNull().alias("is_head"),
            F.col("_out").isNull().alias("is_tail"),
        )
    )
    p.unpersist()
    return out
