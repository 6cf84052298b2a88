"""Structured-metadata extraction: JSON-LD entities + OpenGraph cards.

The machine-readable layer most modern pages ship alongside their HTML —
schema.org JSON-LD islands (``<script type="application/ld+json">``) and
OpenGraph ``<meta property="og:*">`` tags. A crawl that captures these
gets entity types, canonical titles, publish dates, and preview images
for free: the inputs to content-type routing (Article vs Product vs
Recipe), freshness scheduling (datePublished), and multimodal pairing
(og:image next to the text). The reference library strips pages to text
(`textops.stripHtmlToText`); this module is the corpus-enrichment
counterpart, kept pure-Catalyst:

- script-island extraction is one RE2-safe ``regexp_extract_all`` (no
  backreferences — the repo's oracle-parity discipline),
- JSON parsing is ``from_json`` with a narrow schema: malformed payloads
  become null rows, never job failures (broken JSON-LD is endemic),
- OpenGraph reuses the meta-tag token machinery from `metarobots`
  (three quoting styles, case-insensitive names).

Scale: both extractors are map-only codegen projections over the page
scan — no shuffle, no UDF, no JSON library on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one JSON-LD script island, group 1 = the raw JSON payload
_JSONLD_RE = (
    r"(?is)<script[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>"
    r"(.*?)</script>"
)

_JSONLD_SCHEMA = (
    "`@type` string, name string, headline string, datePublished string,"
    " _corrupt string"
)

# one <meta ...> tag; property attribute names the OG key
_META_TAG_RE = "(?i)<meta\\b[^>]*>"
_PROP_RE = "(?i)\\bproperty\\s*=\\s*[\"']?(og:[a-z:_]+)"
_CONTENT_DQ_RE = "(?i)\\bcontent\\s*=\\s*\"([^\"]*)\""
_CONTENT_SQ_RE = "(?i)\\bcontent\\s*=\\s*'([^']*)'"
_CONTENT_UQ_RE = "(?i)\\bcontent\\s*=\\s*([^\\s\"'>]+)"


def jsonld_entities(
    pages: DataFrame, id_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Pages → one row per JSON-LD island: (id, ld_idx, ld_type, name,
    headline, date_published, valid). ``valid`` is false when the
    payload failed to parse as a JSON object (from_json null — broken
    JSON-LD is endemic and must never fail the scan); top-level JSON
    ARRAYS (a page declaring several entities in one island) are out of
    the narrow schema and also surface as valid=false rather than being
    silently flattened."""
    html = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    payloads = F.regexp_extract_all(html, F.lit(_JSONLD_RE), F.lit(1))
    rows = pages.select(
        F.col(id_col).alias("id"),
        F.posexplode(payloads).alias("ld_idx", "payload"),
    ).withColumn(
        "j",
        F.from_json(
            F.trim(F.col("payload")),
            _JSONLD_SCHEMA,
            {"columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    return rows.select(
        "id",
        "ld_idx",
        F.col("j.@type").alias("ld_type"),
        F.col("j.name").alias("name"),
        F.col("j.headline").alias("headline"),
        F.col("j.datePublished").alias("date_published"),
        (F.col("j").isNotNull() & F.col("j._corrupt").isNull()).alias(
            "valid"
        ),
    )


def og_properties(
    pages: DataFrame, id_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Pages → one row per OpenGraph meta tag: (id, og_idx, prop,
    content) — ``og:title``/``og:type``/``og:image``/… in document
    order, property lowercased, content decoded from the three quoting
    styles. Tags without an og: property are skipped; keep-FIRST per
    property is the consumer's choice (Facebook's own parser takes the
    first), composable downstream."""
    html = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    metas = F.regexp_extract_all(html, F.lit(_META_TAG_RE), F.lit(0))
    og = F.filter(
        metas, lambda m: F.regexp_extract(m, _PROP_RE, 1) != ""
    )
    content = lambda m: F.coalesce(  # noqa: E731
        F.nullif(F.regexp_extract(m, _CONTENT_DQ_RE, 1), F.lit("")),
        F.nullif(F.regexp_extract(m, _CONTENT_SQ_RE, 1), F.lit("")),
        F.nullif(F.regexp_extract(m, _CONTENT_UQ_RE, 1), F.lit("")),
        F.lit(""),
    )
    pairs = F.transform(
        og,
        lambda m: F.struct(
            F.lower(F.regexp_extract(m, _PROP_RE, 1)).alias("prop"),
            content(m).alias("content"),
        ),
    )
    return pages.select(
        F.col(id_col).alias("id"), F.posexplode(pairs).alias("og_idx", "p")
    ).select(
        "id", "og_idx", F.col("p.prop").alias("prop"),
        F.col("p.content").alias("content"),
    )


_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
_H1_RE = r"(?is)<h1[^>]*>(.*?)</h1>"
_OG_TITLE_TAG_RE = (
    "(?i)<meta\\b[^>]*property\\s*=\\s*[\"']?og:title[\"']?[^>]*>"
)


def title_consistency(
    pages: DataFrame, id_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-page title-surface agreement: (id, title, og_title, h1,
    title_eq_og, title_eq_h1) — the three places a page declares its
    name (<title>, og:title, first <h1>), compared after tag-strip,
    entity-decode, whitespace-collapse and case-fold. Disagreement is a
    QC signal the SEO world reads as template rot or keyword stuffing;
    agreement picks the canonical display string for SERP/corpus
    metadata (the reference keeps only <title> —
    src/textops extractHtmlMetadata; this is the cross-check around
    it). First occurrence wins for all three (the og_properties
    keep-first convention). Null surfaces compare as NOT equal —
    absence is disagreement. Map-only codegen projection."""
    from ..metarobots import _first_attr  # same quote-variant machinery
    from .content import _visible_text  # tag strip + entity chain + collapse

    html = F.coalesce(F.col(html_col).cast("string"), F.lit(""))

    def norm(c: Column) -> Column:
        return F.lower(_visible_text(c))

    title = F.nullif(
        norm(F.regexp_extract(html, _TITLE_RE, 1)), F.lit("")
    )
    og_tag = F.get(
        F.regexp_extract_all(html, F.lit(_OG_TITLE_TAG_RE), F.lit(0)), 0
    )
    og_title = F.nullif(
        norm(
            F.coalesce(
                _first_attr(
                    og_tag, _CONTENT_DQ_RE, _CONTENT_SQ_RE, _CONTENT_UQ_RE
                ),
                F.lit(""),
            )
        ),
        F.lit(""),
    )
    h1 = F.nullif(norm(F.regexp_extract(html, _H1_RE, 1)), F.lit(""))
    return pages.select(
        F.col(id_col).alias("id"),
        title.alias("title"),
        og_title.alias("og_title"),
        h1.alias("h1"),
        (title.isNotNull() & og_title.isNotNull() & (title == og_title)).alias(
            "title_eq_og"
        ),
        (title.isNotNull() & h1.isNotNull() & (title == h1)).alias(
            "title_eq_h1"
        ),
    )


# one <table>…</table> region (innermost-first is NOT attempted: the lazy
# match runs from the first <table> to the first </table>, so a nested
# table truncates its parent — documented limitation, rare on the real
# web, and the oracle derives expected rows from the synthetic
# construction rather than re-running the regex)
_TABLE_RE = r"(?is)<table\b[^>]*>(.*?)</table>"
_TR_RE = r"(?is)<tr\b[^>]*>(.*?)</tr>"
_CELL_RE = r"(?is)<t[dh]\b[^>]*>(.*?)</t[dh]>"
_TH_RE = r"(?is)<th[\s>]"


def html_tables(
    pages: DataFrame, id_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Pages → one row per table row: (id, table_idx, row_idx,
    cells_joined, n_cells, header).

    HTML tables carry the densest structured data on the open web
    (statistics, specs, timetables); a training-data pipeline that flattens
    them to prose loses the row/column alignment this extractor preserves.
    The reference strips tables into the text stream
    (`stripHtmlToText`, strip-html.ts); this is the corpus-enrichment
    counterpart, same discipline as `jsonld_entities`/`og_properties`.

    Per cell: tags stripped, the 5-entity chain decoded, whitespace
    collapsed (`content._visible_text` — the same normalization the
    main-content extractor applies). ``header`` is true when the row
    contains at least one ``<th>``. ``cells_joined`` is the '|'-join of
    the cell texts (array flattened for engine-portable comparison; a
    cell containing a literal '|' is ambiguous in the joined form —
    callers needing exact cells use the n_cells count or re-split on a
    stricter contract).

    Scale: two chained posexplodes over map-only regexp_extract_all —
    no shuffle, no UDF, no joins; output size ∝ table rows in the
    corpus, never quadratic.
    """
    html = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    tables = F.regexp_extract_all(html, F.lit(_TABLE_RE), F.lit(1))
    per_table = pages.select(
        F.col(id_col).alias("id"),
        F.posexplode(tables).alias("table_idx", "tbl"),
    )
    rows = F.regexp_extract_all(
        F.col("tbl"), F.lit(_TR_RE), F.lit(1)
    )
    per_row = per_table.select(
        "id",
        "table_idx",
        F.posexplode(rows).alias("row_idx", "row_html"),
    )
    from .content import _visible_text

    cells = F.transform(
        F.regexp_extract_all(F.col("row_html"), F.lit(_CELL_RE), F.lit(1)),
        _visible_text,
    )
    return per_row.select(
        "id",
        "table_idx",
        "row_idx",
        F.array_join(cells, "|").alias("cells_joined"),
        F.size(cells).alias("n_cells"),
        F.col("row_html").rlike(_TH_RE).alias("header"),
    )


_PUB_META_TAG_RE = (
    "(?i)<meta\\b[^>]*property\\s*=\\s*[\"']?article:published_time[^>]*>"
)


def publish_date_fusion(
    pages: DataFrame,
    id_col: str = "url",
    html_col: str = "html",
    url_col: str | None = None,
) -> DataFrame:
    """Best-estimate publication date per page with provenance:
    (id, pub_date, pub_source ∈ {jsonld, meta, url, null}).

    Precedence mirrors measured field precision (structured data beats
    conventions): schema.org JSON-LD ``datePublished`` → OpenGraph-style
    ``<meta property="article:published_time">`` → the URL-path date
    convention (full /YYYY/MM/DD only — `dust.url_path_dates` owns the
    weaker monthly form; used only when ``url_col`` is given). First
    non-null wins; each source is normalized to its
    YYYY-MM-DD prefix when it carries a full timestamp. The recrawl
    scheduler treats the fused date exactly like sitemap lastmod — a
    prior, not ground truth.

    One map-only projection reusing the three extractors' expressions —
    no UDF, no shuffle, no joins."""
    from ..metarobots import _first_attr
    from .dust import _URL_DATE_YMD_DASH_RE, _URL_DATE_YMD_SLASH_RE

    html = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    ld = F.from_json(
        F.trim(
            F.get(F.regexp_extract_all(html, F.lit(_JSONLD_RE), F.lit(1)), 0)
        ),
        _JSONLD_SCHEMA,
    )
    jsonld_date = F.nullif(
        F.substring(F.col("_ld")["datePublished"], 1, 10), F.lit("")
    )
    meta_tag = F.get(
        F.regexp_extract_all(html, F.lit(_PUB_META_TAG_RE), F.lit(0)), 0
    )
    meta_date = F.nullif(
        F.substring(
            F.coalesce(
                _first_attr(
                    meta_tag, _CONTENT_DQ_RE, _CONTENT_SQ_RE, _CONTENT_UQ_RE
                ),
                F.lit(""),
            ),
            1,
            10,
        ),
        F.lit(""),
    )
    if url_col is not None:
        u = F.col(url_col)
        y = F.coalesce(
            F.nullif(F.regexp_extract(u, _URL_DATE_YMD_SLASH_RE, 1), F.lit("")),
            F.nullif(F.regexp_extract(u, _URL_DATE_YMD_DASH_RE, 1), F.lit("")),
        )
        m = F.coalesce(
            F.nullif(F.regexp_extract(u, _URL_DATE_YMD_SLASH_RE, 2), F.lit("")),
            F.nullif(F.regexp_extract(u, _URL_DATE_YMD_DASH_RE, 2), F.lit("")),
        )
        d = F.coalesce(
            F.nullif(F.regexp_extract(u, _URL_DATE_YMD_SLASH_RE, 3), F.lit("")),
            F.nullif(F.regexp_extract(u, _URL_DATE_YMD_DASH_RE, 3), F.lit("")),
        )
        valid = m.cast("int").between(1, 12) & d.cast("int").between(1, 31)
        url_date = F.when(
            y.isNotNull() & valid, F.concat_ws("-", y, m, d)
        )
    else:
        url_date = F.lit(None).cast("string")

    with_ld = pages.withColumn("_ld", ld)
    pub = F.coalesce(jsonld_date, meta_date, url_date)
    source = (
        F.when(jsonld_date.isNotNull(), F.lit("jsonld"))
        .when(meta_date.isNotNull(), F.lit("meta"))
        .when(url_date.isNotNull(), F.lit("url"))
    )
    return with_ld.select(
        F.col(id_col).alias("id"),
        pub.alias("pub_date"),
        source.alias("pub_source"),
    )
