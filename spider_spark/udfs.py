"""Arrow-vectorized pandas UDFs wrapping the byte-identical scalar core.

Design: one combined ``parse_page`` UDF does text + metadata + links +
detector extraction in a single pass per HTML payload (one Arrow transfer,
one regex pass over each document) instead of N separate UDF columns. All
UDFs are ``Iterator[pd.Series]`` style so per-batch setup is amortized and
Spark can pipeline batches.

The scalar semantics live in ``textops``/``urlops`` (cited there against
/root/reference); this module only vectorizes them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.functions import pandas_udf

from . import textops, urlops

LINK_STRUCT = StructType(
    [
        StructField("pos", IntegerType()),
        StructField("href", StringType()),
        StructField("href_canon", StringType()),  # crawl-canonical form, or null if not crawlable
        StructField("text", StringType()),
        StructField("title", StringType()),
        StructField("aria_label", StringType()),
        StructField("rel", StringType()),
        StructField("target", StringType()),
        StructField("classes", ArrayType(StringType())),
    ]
)

DETECTED_STRUCT = StructType(
    [
        StructField("url", StringType()),
        StructField("type", StringType()),
        StructField("is_pdf", BooleanType()),
        StructField("strategy", StringType()),
    ]
)

# DownloadInfo (src/shared/types.ts:4-19): downloads are first-class data —
# raw bytes ride a BINARY column, never the driver
DOWNLOAD_STRUCT = StructType(
    [
        StructField("url", StringType()),
        StructField("filename", StringType()),
        StructField("content_type", StringType()),
        StructField("content", BinaryType()),
        StructField("error", StringType()),
    ]
)

PARSED_STRUCT = StructType(
    [
        StructField("text", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("links", ArrayType(LINK_STRUCT)),
        StructField("detected", DETECTED_STRUCT),
        StructField("is_pdf", BooleanType()),
    ]
)


def _to_str(v) -> str:
    if v is None:
        return ""
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", errors="replace")
    return v


def _parse_one(url: str, html) -> dict:
    html = _to_str(html)
    url = _to_str(url)
    meta = textops.extract_html_metadata(html)
    links = [
        {
            "pos": i,
            "href": l.href,
            "href_canon": urlops.canonicalize_url(l.href),
            "text": l.text,
            "title": l.title,
            "aria_label": l.aria_label,
            "rel": l.rel,
            "target": l.target,
            "classes": l.classes,
        }
        for i, l in enumerate(textops.extract_html_links(html, url))
    ]
    detected = textops.detect_document_url(url, html)
    is_pdf = textops.is_pdf_page(url, html)
    return {
        "text": textops.strip_html_to_text(html),
        "title": meta["title"],
        "description": meta["description"],
        "links": links,
        "detected": detected,
        "is_pdf": is_pdf,
    }


@pandas_udf(PARSED_STRUCT)
def parse_page(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.DataFrame]:
    """(url, html) → struct(text, title, description, links, detected, is_pdf).

    The single-pass extraction stage of the crawl tick; byte-identical text
    per the reference's stripHtmlToText (scrapeDocument.ts:207-214)."""
    for urls, htmls in it:
        rows = [_parse_one(u, h) for u, h in zip(urls, htmls)]
        yield pd.DataFrame(rows)


@pandas_udf(StringType())
def strip_html_text(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """html → extracted text (byte-identical stripHtmlToText)."""
    for htmls in it:
        yield htmls.map(lambda h: textops.strip_html_to_text(_to_str(h)))


@pandas_udf(StringType())
def normalize_html(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """The DOM adapter's processHtml (dom.ts:36-49): parse → re-serialize,
    falling back to the raw input when parsing fails. A deterministic
    string→string normalization (parser round-trip), the engine's
    ``adapter='dom'`` fetch variant."""
    for htmls in it:
        yield htmls.map(lambda h: textops.normalize_html(_to_str(h)))


@pandas_udf(StringType())
def canonicalize_url(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """url → canonical crawl URL (WHATWG normalize + fragment drop +
    download-page trailing slash) or null if not crawlable http(s)."""
    for urls in it:
        yield urls.map(lambda u: urlops.canonicalize_url(_to_str(u)))


CANON_HOST_STRUCT = StructType(
    [StructField("url_canon", StringType()), StructField("host", StringType())]
)


@pandas_udf(CANON_HOST_STRUCT)
def canon_and_host(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """url → (canonical URL, host) in ONE Python pass — the seed/frontier
    hygiene stage, fused so bootstrap costs one Arrow round trip, not two."""
    for urls in it:
        canons = [urlops.canonicalize_url(_to_str(u)) for u in urls]
        hosts = [None if c is None else urlops.url_host(c) for c in canons]
        yield pd.DataFrame({"url_canon": canons, "host": hosts})


@pandas_udf(StringType())
def url_host(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for urls in it:
        yield urls.map(lambda u: urlops.url_host(_to_str(u)))


@pandas_udf(StringType())
def resolve_href(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    """(href, base) → absolute URL with reference passthrough semantics."""
    for hrefs, bases in it:
        yield pd.Series(
            [textops.resolve_href(_to_str(h), _to_str(b)) for h, b in zip(hrefs, bases)]
        )


@pandas_udf(StringType())
def normalize_download_page_url(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for urls in it:
        yield urls.map(lambda u: textops.normalize_download_page_url(_to_str(u)))


@pandas_udf(StringType())
def infer_content_type(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for names in it:
        yield names.map(lambda n: textops.infer_content_type(None if n is None else str(n)))


C4AI_LINK_STRUCT = StructType(
    [
        StructField("href", StringType()),
        StructField("text", StringType()),
        StructField("title", StringType()),
    ]
)


@pandas_udf(ArrayType(C4AI_LINK_STRUCT))
def resolve_link_array(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    """(links ARRAY<STRUCT href,text,title>, base) → hrefs resolved
    against base (WHATWG, passthrough on failure), text trimmed, keep-first
    dedupe on the RESOLVED href in array order — the crawl4ai
    server-links normalization (crawl4ai.ts:66-100) in one Arrow pass."""
    for links_col, bases in it:
        out = []
        for links, base in zip(links_col, bases):
            if links is None:
                out.append([])
                continue
            seen, rows = set(), []
            for l in links:
                href = l["href"] if isinstance(l, dict) else l.href
                text = l["text"] if isinstance(l, dict) else l.text
                title = l["title"] if isinstance(l, dict) else l.title
                if not href:
                    continue
                resolved = textops.resolve_href(_to_str(href), _to_str(base))
                if resolved in seen:
                    continue
                seen.add(resolved)
                rows.append({"href": resolved, "text": textops.js_trim(_to_str(text or "")), "title": title})
            out.append(rows)
        yield pd.Series(out)


# --- pure-Catalyst column helpers (no Python; JVM-side, codegen-friendly) ---


def col_is_pdf_file(col):
    """isPdfFile as a Catalyst expression (download-utils.ts:71-73)."""
    return F.endswith(F.lower(col), F.lit(".pdf"))


def col_infer_content_type(filename_col):
    """inferContentType (download-utils.ts:59-66) JVM-side: the 40-entry
    extension→MIME table as a map literal, probed with the lowered last
    extension — stays in codegen, unlike the pandas-UDF variant."""
    from .textops import _MIME_TYPES

    name = F.coalesce(filename_col, F.lit(""))
    ext = F.regexp_extract(F.lower(name), r"\.[^.]+$", 0)
    mime_map = F.create_map(*[F.lit(x) for kv in _MIME_TYPES.items() for x in kv])
    return F.when(ext == "", F.lit("application/octet-stream")).otherwise(
        F.coalesce(mime_map[ext], F.lit("application/octet-stream"))
    )


def col_is_download_error(msg_col):
    """isDownloadError (download-utils.ts:121-126): the message indicates a
    browser download was triggered, not a navigation failure."""
    m = F.coalesce(msg_col, F.lit(""))
    return F.contains(m, F.lit("Download is starting")) | F.contains(
        m, F.lit("net::ERR_ABORTED")
    )


def materialize_download(url_col, filename_col, content_col, error_col=None):
    """handlePlaywrightDownload (download-utils.ts:80-113) as a DownloadInfo
    struct projection, branch-exact:

    - thrown failure (``error_col`` non-null): url + filename + the error
      message, NO content_type/content,
    - path unavailable (``content_col`` null): inferred content_type,
      error='Download path not available',
    - success: inferred content_type + the bytes."""
    thrown = (
        error_col.isNotNull() if error_col is not None else F.lit(False)
    )
    error = F.when(thrown, error_col).when(
        content_col.isNull(), F.lit("Download path not available")
    )
    return F.struct(
        url_col.alias("url"),
        filename_col.alias("filename"),
        F.when(~thrown, col_infer_content_type(filename_col)).alias("content_type"),
        F.when(~thrown, content_col).alias("content"),
        error.alias("error"),
    )


def col_is_pdf_page(url_col, content_col):
    """PDF-page heuristic as a Catalyst expression (scrapeDocument.ts:300-303)."""
    return (
        F.endswith(F.lower(url_col), F.lit(".pdf"))
        | F.contains(content_col, F.lit("application/pdf"))
        | F.contains(content_col, F.lit("%PDF-"))
    )


def col_url_hash(url_col):
    """Stable 64-bit identity hash of the canonical URL (xxhash64 built-in) —
    the sharded seen-filter key; sha2 is available for collision-free audit."""
    return F.xxhash64(url_col)


def col_url_fp128(url_col):
    """128-bit url fingerprint (md5 bytes) — the seen-filter's EQUALITY
    payload. Identity is (xxhash64, fp128) = 192 independent bits: birthday
    collisions at 10^10 URLs ≈ 10^20/2^193 ≈ 10^-38 — structurally zero,
    while the anti-join shuffle ships 24 bytes/row instead of the full
    canonical string (~70 B). Computed in projection BEFORE the exchange,
    so only the scan (local, column-pruned) ever touches the strings."""
    return F.unhex(F.md5(url_col))


def col_host_shard(host_col, num_shards: int):
    """Deterministic shard id from host — the politeness/skew partitioner."""
    return F.pmod(F.xxhash64(host_col), F.lit(num_shards))


# click-tracking / analytics query params that never change page content —
# stripping them before the seen-filter collapses per-campaign URL aliases
# of the same page into one frontier entry
TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|dclid|fbclid|msclkid|mc_eid|mc_cid|igshid|ref_src|yclid|_hsenc|_hsmi)="


def col_strip_tracking_params(url_col):
    """Remove tracking query params (utm_*, gclid, fbclid, …) from a
    canonical URL — pure Catalyst (split → filter → rejoin), order of the
    surviving params preserved. An optional extra canonicalization step
    ahead of ``col_url_hash``: per-campaign aliases of one page then share
    one seen-filter identity. Expects fragment-free canonical URLs (the
    ``canon_and_host`` output); a URL without a query passes through."""
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    query = F.parse_url(u, F.lit("QUERY"))
    base = F.substring_index(u, "?", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~p.rlike(TRACKING_PARAM_RE),
    )
    rebuilt = F.when(F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))).otherwise(
        base
    )
    return F.when(query.isNull() | (query == ""), u).otherwise(rebuilt)


def col_filter_links_predicate(href_col, text_col, config: dict):
    """filterLinks (link-filter.ts:24-66) as a pure Catalyst predicate:
    include-union over urlContains/textContains, then excludes. Case folded
    with lower(); dedupe is handled separately (window keep-first)."""
    href_l, text_l = F.lower(href_col), F.lower(text_col)
    url_needles = [s.lower() for s in config.get("urlContains") or []]
    text_needles = [s.lower() for s in config.get("textContains") or []]
    excludes = [s.lower() for s in config.get("excludes") or []]
    pred = href_col.isNotNull() & (href_col != F.lit(""))
    if url_needles or text_needles:
        inc = F.lit(False)
        for n in url_needles:
            inc = inc | F.contains(href_l, F.lit(n))
        for n in text_needles:
            inc = inc | F.contains(text_l, F.lit(n))
        pred = pred & inc
    for n in excludes:
        pred = pred & ~(F.contains(href_l, F.lit(n)) | F.contains(text_l, F.lit(n)))
    return pred


def col_prefer_cleaned_html(cleaned_col, html_col):
    """The crawl4ai 'prefer cleaned_html, fall back to html' rule
    (crawl4ai.ts:243, `cleaned_html || html || ''`): JS `||` is FALSY
    fallback, so an empty-string cleaned_html (common when cleaning strips
    everything) falls through to the raw html — nullif('') before the
    coalesce, not a plain null-only coalesce."""
    return F.coalesce(
        F.nullif(cleaned_col, F.lit("")), F.nullif(html_col, F.lit("")), F.lit("")
    )


def col_skip_link_predicate(href_col, text_col):
    """Crawlee skip-link heuristic (crawlee.ts:137-143) as a Catalyst
    predicate: a '#' href whose text contains skip/menu or exceeds 100
    chars."""
    t = F.coalesce(text_col, F.lit(""))
    return (href_col == "#") & (
        F.contains(F.lower(t), F.lit("skip"))
        | F.contains(F.lower(t), F.lit("menu"))
        | (F.length(t) > 100)
    )


def dedupe_downloads(df, url_col: str = "url", filename_col: str = "filename",
                     content_type_col: str = "content_type"):
    """Download dedupe by (url, filename, contentType) — the '\\0'-joined
    key of browser-runner.ts:204-222."""
    return df.dropDuplicates([url_col, filename_col, content_type_col])


def col_doc_extension_predicate(href_col, extensions: list[str] | None = None):
    """findDocumentLinks suffix filter (scrapeDocument.ts:337-356)."""
    exts = extensions or textops.DEFAULT_DOC_EXTENSIONS
    href_l = F.lower(href_col)
    pred = F.lit(False)
    for e in exts:
        pred = pred | F.endswith(href_l, F.lit(e.lower()))
    return pred
