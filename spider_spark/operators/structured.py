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
