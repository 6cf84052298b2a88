"""Main-content extraction: block-level boilerplate classification.

The reference extracts the FULL text of a page byte-identically
(`src/scrapers.ts` stripHtmlToText — locked by the 17 golden fixtures and
implemented in `textops.py`). A training-data pipeline additionally wants
the page's MAIN content with navigation/footer/link-list boilerplate
removed — the jusText / Boilerpipe family of classifiers (Pomikálek 2011;
Kohlschütter et al., WSDM 2010). This module is a simplified,
deterministic restatement of that idea, kept 100% Catalyst so it runs at
scan speed with zero Python in the hot path:

1. drop <head>, <script>/<style>/<noscript> bodies and HTML comments,
2. segment the page into blocks at block-level tag boundaries
   (``<p> <div> <li> <nav> <footer> ...`` — inline tags like ``<a>``,
   ``<b>`` stay inside their block),
3. per block, compute the visible text (tags stripped, the reference's
   5-entity chain decoded, whitespace collapsed), its word count, and its
   link density (chars of text inside ``<a>...</a>`` / total chars),
4. context-free classification: a block is GOOD when it has
   ≥ ``min_words`` words and link density ≤ ``max_link_density``; blocks
   over the link-density cap are BAD (never rescued); the rest are SHORT,
5. one context pass (the jusText neighborhood rule, single-step instead
   of iterated so the result is order-deterministic and SQL-expressible):
   a SHORT block with ≥ ``promote_min_words`` words is promoted to GOOD
   when an adjacent non-empty block is context-free GOOD,
6. main_text = the GOOD blocks' text in document order, newline-joined.

Scale shape (100 TB): steps 1-4 are one codegen projection over the page
scan (split + higher-order functions, no UDF); the context pass is a
lag/lead window partitioned by page — a single shuffle on the page id with
per-page bounded state; reassembly is the per-doc array_sort pattern every
census operator here uses. No collects, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Block-level elements that terminate a text block (HTML5 flow content
# boundaries plus <br>). Inline elements (<a> <b> <i> <span> <em> ...)
# deliberately absent — their text belongs to the enclosing block.
_BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th"
    r"|section|article|header|footer|nav|aside|main|figure|figcaption"
    r"|blockquote|pre|form|fieldset|hr|br|html|body|center)(?:\s[^>]*)?/?>"
)


def _decode5(c: Column) -> Column:
    """The reference's exactly-5 sequential entity replaces
    (detectors.ts:13-20, scalar twin `textops.decode_html_entities`) —
    chained in source order, so '&amp;quot;' decodes all the way."""
    for ent, ch in (("&amp;", "&"), ("&quot;", '"'), ("&#039;", "'"), ("&lt;", "<"), ("&gt;", ">")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _visible_text(frag: Column) -> Column:
    """Fragment HTML → collapsed visible text (strip tags, decode the
    5-entity chain, collapse whitespace)."""
    return F.trim(
        F.regexp_replace(_decode5(F.regexp_replace(frag, r"<[^>]*>", " ")), r"\s+", " ")
    )


def _strip_invisible(html: Column) -> Column:
    """Remove content the browser never renders: <head>, script/style/
    noscript bodies, comments. Separate patterns per tag — Spark's Java
    regex supports backreferences but DuckDB's RE2 (the oracle engine)
    does not, and keeping both sides on the common subset is the repo's
    standing oracle-parity discipline."""
    out = html
    for pat in (
        r"(?is)<head[\s>].*?</head>",
        r"(?is)<script[\s>].*?</script>",
        r"(?is)<style[\s>].*?</style>",
        r"(?is)<noscript[\s>].*?</noscript>",
        r"(?s)<!--.*?-->",
    ):
        out = F.regexp_replace(out, pat, " ")
    return out


def page_blocks(
    pages: DataFrame,
    id_col: str = "url",
    html_col: str = "html",
    max_link_density: float = 0.3,
    min_words: int = 5,
) -> DataFrame:
    """Pages → one row per non-empty text block:
    (id, pos, block_text, n_words, link_chars, n_chars, link_density,
    cf_class) with cf_class ∈ good|short|bad. Pure projection + explode —
    the classifier's shared front half."""
    html = F.col(html_col).cast("string")
    frags = F.split(_strip_invisible(html), _BLOCK_TAG_RE)
    b = pages.select(
        F.col(id_col).alias("id"), F.posexplode(frags).alias("raw_pos", "frag")
    ).withColumn("block_text", _visible_text(F.col("frag")))
    b = b.filter(F.col("block_text") != "")
    link_txts = F.expr(r"regexp_extract_all(frag, '(?is)<a[\\s>][^>]*>(.*?)</a>', 1)")
    # length of each anchor's visible text, summed
    link_chars = F.aggregate(
        F.transform(link_txts, lambda x: F.length(_visible_text(x))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    b = (
        b.withColumn("n_chars", F.length("block_text"))
        .withColumn("n_words", F.size(F.split(F.col("block_text"), r"\s+")))
        .withColumn("link_chars", F.least(link_chars, F.col("n_chars")))
        .withColumn("link_density", F.col("link_chars") / F.col("n_chars"))
        .withColumn(
            "cf_class",
            F.when(F.col("link_density") > max_link_density, F.lit("bad"))
            .when(F.col("n_words") >= min_words, F.lit("good"))
            .otherwise(F.lit("short")),
        )
    )
    # re-number positions over surviving (non-empty) blocks so the context
    # window sees true adjacency, not gaps where markup-only fragments were
    w = Window.partitionBy("id").orderBy("raw_pos")
    return b.withColumn("pos", F.row_number().over(w) - 1).select(
        "id", "pos", "block_text", "n_words", "n_chars", "link_chars",
        F.round("link_density", 4).alias("link_density"), "cf_class",
    )


def extract_main_content(
    pages: DataFrame,
    id_col: str = "url",
    html_col: str = "html",
    max_link_density: float = 0.3,
    min_words: int = 5,
    promote_min_words: int = 3,
) -> DataFrame:
    """Pages → (id, n_blocks, n_good, main_chars, main_text).

    ``main_text`` is the newline-join of GOOD blocks in document order
    after the single context-promotion pass (module docstring, step 5).
    Pages whose every block is boilerplate still emit a row with
    ``main_text = ''``."""
    blocks = page_blocks(pages, id_col, html_col, max_link_density, min_words)
    w = Window.partitionBy("id").orderBy("pos")
    promoted = (
        (F.col("cf_class") == "short")
        & (F.col("n_words") >= promote_min_words)
        & (
            (F.lag("cf_class").over(w) == "good")
            | (F.lead("cf_class").over(w) == "good")
        )
    )
    classified = blocks.withColumn(
        "is_good", (F.col("cf_class") == "good") | promoted
    )
    kept_text = F.when(F.col("is_good"), F.col("block_text"))
    return (
        classified.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_blocks"),
            F.sum(F.col("is_good").cast("int")).cast("int").alias("n_good"),
            F.coalesce(
                F.sum(F.when(F.col("is_good"), F.col("n_chars"))), F.lit(0)
            ).cast("int").alias("main_chars"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), kept_text.alias("t")))
                    ),
                    lambda s: s.t,
                ),
                "\n",
            ).alias("main_text"),
        )
    )


_HEADING_FULL_RE = r"(?is)<h[1-6][^>]*>.*?</h[1-6]>"
# group 1 = level digit, group 2 = inner html; closing tag matches any
# level (RE2 — the oracle engine — has no backreferences; well-formed
# pages close the level they opened)
_HEADING_CAP_RE = r"(?is)<h([1-6])[^>]*>(.*?)</h[1-6]>"


def heading_outline(
    pages: DataFrame,
    id_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Pages → one row per heading element in document order:
    (id, idx, level, heading) — the document's structural skeleton
    (h1–h6), the table-of-contents signal section-aware chunking and
    layout QC build on. Invisible regions (<head>, script/style bodies,
    comments) are dropped first so a <title> or templated script string
    never masquerades as a heading. Pure Catalyst: two parallel
    regexp_extract_all (level digits, inner html) zipped by position —
    no UDF, no shuffle."""
    html = _strip_invisible(F.col(html_col).cast("string"))
    pairs = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(_HEADING_CAP_RE), F.lit(1)).alias(
            "lvl"
        ),
        F.regexp_extract_all(html, F.lit(_HEADING_CAP_RE), F.lit(2)).alias(
            "inner"
        ),
    )
    return pages.select(
        F.col(id_col).alias("id"), F.posexplode(pairs).alias("idx", "h")
    ).select(
        "id",
        "idx",
        F.col("h.lvl").cast("int").alias("level"),
        _visible_text(F.col("h.inner")).alias("heading"),
    )


def section_chunks(
    pages: DataFrame,
    id_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Section-aware chunking: split each page at its heading elements
    and pair every section with the heading that introduces it —
    (id, sec_idx, level, heading, sec_text, n_words). sec_idx 0 is the
    pre-heading preamble (heading null, level null), emitted only when
    non-empty; heading-introduced sections are emitted even when empty
    (an empty section under 'Changelog' is itself signal). The chunking
    a training pipeline wants when documents have structure: fixed
    token windows (`chunking.chunk_table`, `langid.token_window_segments`)
    cut mid-thought, section boundaries don't (the retrieval-chunking
    folklore MaxP formalizes at the passage level).

    Pure Catalyst: one split on the FULL heading element (open + inner +
    close — the heading's own text never bleeds into its section), the
    outline re-extracted in the same projection and zipped by position:
    section i pairs with heading i−1. No UDF; one posexplode."""
    html = _strip_invisible(F.col(html_col).cast("string"))
    secs = F.split(html, _HEADING_FULL_RE)
    lvls = F.regexp_extract_all(html, F.lit(_HEADING_CAP_RE), F.lit(1))
    heads = F.regexp_extract_all(html, F.lit(_HEADING_CAP_RE), F.lit(2))
    rows = pages.select(
        F.col(id_col).alias("id"),
        F.posexplode(secs).alias("sec_idx", "frag"),
        lvls.alias("_lvls"),
        heads.alias("_heads"),
    ).select(
        "id",
        "sec_idx",
        F.when(
            F.col("sec_idx") > 0,
            F.element_at(F.col("_lvls"), F.col("sec_idx")).cast("int"),
        ).alias("level"),
        F.when(
            F.col("sec_idx") > 0,
            _visible_text(F.element_at(F.col("_heads"), F.col("sec_idx"))),
        ).alias("heading"),
        _visible_text(F.col("frag")).alias("sec_text"),
    )
    rows = rows.filter((F.col("sec_idx") > 0) | (F.col("sec_text") != ""))
    return rows.withColumn(
        "n_words",
        F.when(F.col("sec_text") == "", F.lit(0)).otherwise(
            F.size(F.split(F.col("sec_text"), r"\s+"))
        ),
    )


# opening/closing tag names — group 1 is the name; RE2-safe (no
# backreferences), shared verbatim with the DuckDB oracle
_TAG_NAME_RE = "(?i)</?([a-zA-Z][a-zA-Z0-9]*)"


def template_shapes(
    pages: DataFrame,
    id_col: str = "url",
    html_col: str = "html",
    host_col: str | None = None,
    min_pages: int = 2,
) -> DataFrame:
    """Template census by DOM shape: pages whose full tag-name SEQUENCE
    (open and close tags, attributes and text ignored) is identical share
    one generator template. Text-level boilerplate ops (boilerplate_ngrams,
    line_dedup) catch repeated STRINGS; this catches repeated STRUCTURE —
    CMS themes, listing pages, doorway-page generators — even when every
    visible string differs (Bar-Yossef & Rajagopalan, WWW 2002: template
    detection via pagelet structure; the shape fingerprint is the
    degenerate-but-robust whole-page form).

    Output: (shape_fp, n_pages, n_hosts, n_tags, first_id) for shapes with
    ≥ min_pages members. n_tags = tag count of the shape (depth proxy).
    Joining members back is a fingerprint equi-join on the same
    projection.

    Scale shape: map-only fingerprint projection (the tag sequence never
    leaves the executor — md5 reduces it to 128 bits in the same stage),
    then a partial-aggregable census. No UDF, no self-join."""
    html = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    tags = F.transform(
        F.regexp_extract_all(html, F.lit(_TAG_NAME_RE), F.lit(1)), F.lower
    )
    host = F.col(host_col) if host_col else F.col(id_col)
    per_page = pages.select(
        F.col(id_col).alias("_id"),
        host.alias("_host"),
        F.md5(F.array_join(tags, ">")).alias("shape_fp"),
        F.size(tags).alias("_n_tags"),
    )
    return (
        per_page.groupBy("shape_fp")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("_host").alias("n_hosts"),
            F.min("_n_tags").alias("n_tags"),
            F.min("_id").alias("first_id"),
        )
        .filter(F.col("n_pages") >= min_pages)
    )


# anchor element bodies — group 1 is the inner HTML; lazy match, RE2-safe
_ANCHOR_BODY_RE = r"(?is)<a\b[^>]*>(.*?)</a>"


def markup_density(
    pages: DataFrame, id_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Page-level markup-density signals: (id, html_chars, tag_count,
    text_chars, link_chars, text_ratio_r, link_density_r).

    text_ratio (visible text chars / raw HTML chars) and link_density
    (anchor-text chars / visible-text chars) are the oldest reliable
    boilerplate discriminators — navigation/tag-cloud/footer pages sit at
    high link density and low text ratio, article pages the reverse
    (Kohlschütter et al., WSDM 2010 "Boilerplate detection using shallow
    text features"; C4/Gopher apply the same idea at line/doc level).
    `extract_main_content` classifies BLOCKS; this is the page-level
    rollup a crawl can use to triage before block work, and a corpus
    datacard can aggregate per host.

    Visible text = `_strip_invisible` (head/script/style/noscript/
    comments) → `_visible_text` (tag strip, 5-entity chain, collapse) —
    the exact normalization the block path uses. Anchor text is measured
    on the raw body (an <a> inside a stripped region does not count
    toward text but would toward links — at the documented signal
    granularity that bias is negligible and the plan stays one
    projection). Ratios are 0.0 when the denominator is 0. Map-only
    codegen; no UDF, no shuffle, no join."""
    html = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    visible = _visible_text(_strip_invisible(html))
    anchor_lens = F.transform(
        F.regexp_extract_all(html, F.lit(_ANCHOR_BODY_RE), F.lit(1)),
        lambda a: F.length(_visible_text(a)),
    )
    link_chars = F.coalesce(
        F.aggregate(anchor_lens, F.lit(0), lambda acc, x: acc + x), F.lit(0)
    )
    html_chars = F.length(html)
    text_chars = F.length(visible)
    return pages.select(
        F.col(id_col).alias("id"),
        html_chars.alias("html_chars"),
        F.size(F.regexp_extract_all(html, F.lit(_TAG_NAME_RE), F.lit(0))).alias(
            "tag_count"
        ),
        text_chars.alias("text_chars"),
        link_chars.alias("link_chars"),
        F.round(
            F.when(html_chars > 0, text_chars / html_chars).otherwise(F.lit(0.0)),
            6,
        ).alias("text_ratio_r"),
        F.round(
            F.when(text_chars > 0, link_chars / text_chars).otherwise(F.lit(0.0)),
            6,
        ).alias("link_density_r"),
    )
