"""DataFrame-level scrape operators — the engine forms of the reference's
three entry points (SURVEY.md §3).

- ``scrape_index``    ≙ scrapeIndex (/root/reference/src/scrapeIndex.ts:64-87):
  page → extracted links table.
- ``scrape_document`` ≙ scrapeDocument (/root/reference/src/scrapeDocument.ts:249-320):
  the 4-way CASE over a fetched page (downloads → detector chain → PDF
  heuristic → text+metadata), expressed as one ``when/otherwise`` struct
  projection — order-preserving by construction.
- ``filter_links_df`` ≙ filterLinks (/root/reference/src/platform/link-filter.ts:24-66):
  pure Catalyst predicate + keep-first dedupe window.
- ``find_document_links`` ≙ findDocumentLinks
  (/root/reference/src/scrapeDocument.ts:333-360).

All operators take/return DataFrames and stay in whole-stage codegen except
the single parse UDF column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import udfs
from .textops import DEFAULT_DOC_EXTENSIONS


def parse_pages(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """pages → + ``parsed`` struct (text, title, description, links,
    detected, is_pdf) in ONE vectorized UDF pass."""
    return pages.withColumn("parsed", udfs.parse_page(F.col(url_col), F.col(html_col)))


def scrape_index(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """Page rows → one row per extracted link, document order, keep-first
    dedupe already applied inside the extractor (links.ts:31-35).

    Output: (url, pos, href, href_canon, text, title, aria_label, rel,
    target, classes)."""
    parsed = parse_pages(pages, url_col, html_col)
    return parsed.select(
        F.col(url_col).alias("url"),
        F.posexplode_outer("parsed.links").alias("pos", "link"),
    ).filter(F.col("link").isNotNull()).select(
        "url",
        "pos",
        F.col("link.href").alias("href"),
        F.col("link.href_canon").alias("href_canon"),
        F.col("link.text").alias("text"),
        F.col("link.title").alias("title"),
        F.col("link.aria_label").alias("aria_label"),
        F.col("link.rel").alias("rel"),
        F.col("link.target").alias("target"),
        F.col("link.classes").alias("classes"),
    )


def filter_links_df(links: DataFrame, config: dict | None = None,
                    href_col: str = "href", text_col: str = "text",
                    order_cols: tuple = ("url", "pos")) -> DataFrame:
    """filterLinks as a Catalyst plan: include-union + excludes predicate,
    then keep-first dedupe on the ORIGINAL-case href per page
    (link-filter.ts:56-61), encounter order = the data-derived (url, pos)."""
    config = config or {}
    out = links.filter(udfs.col_filter_links_predicate(F.col(href_col), F.col(text_col), config))
    if config.get("dedupe", True):
        w = Window.partitionBy("url", href_col).orderBy(*[F.col(c) for c in order_cols])
        out = out.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    return out


def find_document_links(pages: DataFrame, extensions: list[str] | None = None,
                        url_col: str = "url", html_col: str = "html") -> DataFrame:
    """scrapeDocument.ts:333-360: scrape the index then keep hrefs whose
    lowercase form ends with a document extension; unique keep-first.
    Output: (url, href)."""
    links = scrape_index(pages, url_col, html_col)
    kept = links.filter(udfs.col_doc_extension_predicate(F.col("href"), extensions))
    w = Window.partitionBy("url", "href").orderBy("pos")
    return (
        kept.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
        .select("url", "href")
    )


def simple_fetch_pages(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """The SimpleAdapter fetch variant (simple.ts:34-154) over already-
    materialized page rows: raw content, standard parse struct. (The
    redirect-following / final-url half of the simple adapter lives in the
    crawl tick — frontier.resolve_redirects/fetch_and_parse.)

    Output: (url, content, parsed)."""
    return pages.withColumn("content", F.col(html_col).cast("string")).withColumn(
        "parsed", udfs.parse_page(F.col(url_col), F.col("content"))
    ).select(url_col, "content", "parsed")


#: mutable fetch-adapter registry — the ``SpiderAdapter`` extension point
#: (src/types.ts:SpiderAdapter, src/factory.ts:79-104): a user plugs a
#: custom DataFrame-level fetch variant ``(pages, ...) -> DataFrame`` under
#: a new name and the factory dispatches to it like a built-in.
_FETCH_ADAPTERS = {}


def register_fetch_adapter(name: str, fn, replace: bool = False) -> None:
    """Register a custom fetch adapter. Duplicate names are rejected
    unless ``replace=True`` — the same dup-reject discipline as the
    platform ``AdapterRegistry`` (src/platform/registry.ts:64-69)."""
    if name in _FETCH_ADAPTERS and not replace:
        raise ValueError(f"fetch adapter already registered: {name!r}")
    _FETCH_ADAPTERS[name] = fn


def unregister_fetch_adapter(name: str) -> None:
    _FETCH_ADAPTERS.pop(name, None)


def get_fetch_adapter(adapter: str):
    """Factory dispatch ≙ getSpider (factory.ts:79-104): adapter name →
    the DataFrame-level fetch variant; unknown names raise, mirroring the
    discriminated-union exhaustiveness check."""
    if adapter not in _FETCH_ADAPTERS:
        raise ValueError(
            f"unknown spider adapter: {adapter!r} (have {sorted(_FETCH_ADAPTERS)})"
        )
    return _FETCH_ADAPTERS[adapter]


def dom_fetch_pages(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """The DomAdapter fetch variant (dom.ts:54-163): content is the
    happy-dom parse→re-serialize normalization (``processHtml``,
    dom.ts:36-49 — raw string on parse failure), and — unlike simple —
    ``Page.url`` stays the REQUEST url (dom.ts:132), so links resolve
    against the requested address, not a redirect target.

    Output: (url, content, parsed) where parsed is the standard
    byte-identical extraction struct over the NORMALIZED html."""
    normalized = pages.withColumn(
        "content", udfs.normalize_html(F.col(html_col).cast("string"))
    )
    return normalized.withColumn(
        "parsed", udfs.parse_page(F.col(url_col), F.col("content"))
    ).select(url_col, "content", "parsed")


# Crawl4aiResponse (crawl4ai.ts:21-33): the service's JSON result shape.
# ``markdown`` is polymorphic in the reference (string | {fit_markdown,
# raw_markdown}) — parsed both ways below and coalesced.
CRAWL4AI_LINK = "array<struct<href:string, text:string, title:string>>"
CRAWL4AI_RESPONSE_SCHEMA = (
    "struct<success:boolean, url:string, html:string, cleaned_html:string, "
    "status_code:int, error_message:string, "
    f"links:struct<internal:{CRAWL4AI_LINK}, external:{CRAWL4AI_LINK}>>"
)


def parse_crawl4ai_response(json_col: Column) -> Column:
    """Crawl4ai response JSON → typed struct (crawl4ai.ts:217-243 parse +
    unwrap): from_json with the response schema; the polymorphic markdown
    field is resolved to a single string (fit over raw over plain) exactly
    like extractMarkdown (crawl4ai.ts:114-125)."""
    base = F.from_json(json_col, CRAWL4AI_RESPONSE_SCHEMA)
    md_struct = F.from_json(
        json_col, "struct<markdown:struct<fit_markdown:string, raw_markdown:string>>"
    )["markdown"]
    md_plain = F.from_json(json_col, "struct<markdown:string>")["markdown"]
    # extractMarkdown uses JS `||`: empty fit_markdown falls to raw
    markdown = F.coalesce(
        F.nullif(md_struct["fit_markdown"], F.lit("")),
        F.nullif(md_struct["raw_markdown"], F.lit("")),
        F.nullif(md_plain, F.lit("")),
    )
    return F.struct(
        base["success"].alias("success"),
        base["url"].alias("url"),
        base["html"].alias("html"),
        base["cleaned_html"].alias("cleaned_html"),
        base["status_code"].alias("status_code"),
        base["error_message"].alias("error_message"),
        base["links"].alias("links"),
        markdown.alias("markdown"),
    )


def crawl4ai_pages_from_json(responses: DataFrame, url_col: str = "url",
                             json_col: str = "response_json") -> DataFrame:
    """Raw crawl4ai JSON responses → Page rows: parse the response struct,
    prefer cleaned_html, use server-provided links (internal first,
    external keep-first — crawl4ai.ts:66-100) when present, else fall back
    to our own extraction (the cheerio fallback ≙ the parse UDF).

    A failed response (success=false, crawl4ai.ts:235-241's NetworkError
    throw made row-wise) yields an error row: null content/links, the
    error message carried in ``fetch_error`` — failed fetches never leak
    into the corpus as normal pages. ``Page.url`` is the response's final
    URL when present (``crawl4aiResult.url || url``, crawl4ai.ts:246), and
    links resolve against it.

    Output: (url, final_url, content, markdown,
    links ARRAY<STRUCT href,text,title>, link_source, fetch_error)."""
    parsed = responses.withColumn("r", parse_crawl4ai_response(F.col(json_col)))
    ok = F.coalesce(F.col("r.success"), F.lit(False))
    final_url = F.coalesce(F.nullif(F.col("r.url"), F.lit("")), F.col(url_col))
    content = udfs.col_prefer_cleaned_html(F.col("r.cleaned_html"), F.col("r.html"))
    internal = F.coalesce(F.col("r.links.internal"), F.array().cast(CRAWL4AI_LINK))
    external = F.coalesce(F.col("r.links.external"), F.array().cast(CRAWL4AI_LINK))
    both = F.concat(internal, external)  # internal first = list-ordinal order
    # resolve against the FINAL url + keep-first dedupe in one Arrow pass
    server_links = udfs.resolve_link_array(both, final_url)
    own = F.transform(
        udfs.parse_page(final_url, content)["links"],
        lambda l: F.struct(l["href"].alias("href"), l["text"].alias("text"), l["title"].alias("title")),
    )
    use_server = F.size(server_links) > 0
    empty_links = F.array().cast("array<struct<href:string,text:string,title:string>>")
    return parsed.select(
        F.col(url_col).alias("url"),
        F.when(ok, final_url).alias("final_url"),
        F.when(ok, content).alias("content"),
        F.when(ok, F.col("r.markdown")).alias("markdown"),
        F.when(ok, F.when(use_server, server_links).otherwise(own)).otherwise(empty_links).alias("links"),
        F.when(~ok, F.lit(None))
        .when(use_server, F.lit("server"))
        .otherwise(F.lit("extracted"))
        .alias("link_source"),
        F.when(
            ~ok,
            F.coalesce(F.col("r.error_message"), F.lit("Crawl4ai request failed")),
        ).alias("fetch_error"),
    )


def crawl4ai_pages(responses: DataFrame, url_col: str = "url",
                   cleaned_html_col: str = "cleaned_html", html_col: str = "html",
                   markdown_col: str | None = "markdown") -> DataFrame:
    """The Crawl4aiAdapter response → Page assembly (crawl4ai.ts:130-292):
    prefer ``cleaned_html`` over ``html`` (crawl4ai.ts:243 — a coalesce),
    carry the markdown column (string or struct: fit_markdown else
    raw_markdown, crawl4ai.ts:114-125), and fall back to our own link
    extraction when the server provided none (crawl4ai.ts:60-109 cheerio
    fallback ≙ the parse UDF).

    Output: (url, content, markdown, parsed)."""
    content = udfs.col_prefer_cleaned_html(F.col(cleaned_html_col), F.col(html_col))
    out = responses.withColumn("content", content.cast("string"))
    if markdown_col and markdown_col in responses.columns:
        md = F.col(markdown_col)
        if dict(responses.dtypes).get(markdown_col, "string").startswith("struct"):
            # extractMarkdown: fit_markdown || raw_markdown || null
            md = F.coalesce(md["fit_markdown"], md["raw_markdown"])
        out = out.withColumn("markdown", md)
    else:
        out = out.withColumn("markdown", F.lit(None).cast("string"))
    return out.withColumn(
        "parsed", udfs.parse_page(F.col(url_col), F.col("content"))
    ).select(url_col, "content", "markdown", "parsed")


def merge_links_keep_first(link_passes: list[DataFrame], page_col: str = "url",
                           href_col: str = "href", pos_col: str = "pos") -> DataFrame:
    """Keep-first union of link-extraction passes: first writer wins across
    passes in pass order, document order within a pass — the two-pass-
    ordinal Map/Set merge the reference applies everywhere it combines link
    lists. Output carries ``pass_ord`` (which pass won) and preserves the
    encounter order key (pass_ord, pos).

    One window shuffle on (page, href); at scale the passes are co-
    partitioned on page so the union is shuffle-free."""
    tagged = [df.withColumn("pass_ord", F.lit(i)) for i, df in enumerate(link_passes)]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t, allowMissingColumns=True)
    w = Window.partitionBy(page_col, href_col).orderBy("pass_ord", pos_col)
    return u.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def merge_expanded_final_links(expanded: DataFrame, final: DataFrame, **kw) -> DataFrame:
    """Crawlee expanded∪final merge (crawlee.ts:154-163): links discovered
    during accordion expansion win over the post-expansion extraction for
    the same href — `[...expandedLinks, ...finalLinks]` into a keep-first
    Map."""
    return merge_links_keep_first([expanded, final], **kw)


def merge_internal_external_links(internal: DataFrame, external: DataFrame, **kw) -> DataFrame:
    """crawl4ai internal+external merge (crawl4ai.ts:66-100): internal
    links first, externals only for unseen hrefs — same keep-first Set,
    list-ordinal internal→external."""
    return merge_links_keep_first([internal, external], **kw)


def _norm_download_url(url_col: Column) -> Column:
    """normalizeDownloadPageUrl (scrapeDocument.ts:129-148) as a Catalyst
    expression: append '/' to /download/ URLs with no query, no trailing
    slash, and no file-ish extension on the path."""
    path = F.coalesce(F.parse_url(url_col, F.lit("PATH")), F.lit(""))
    looks_like_file = path.rlike(r"(?i)\.[a-z0-9]{2,8}$")
    needs_slash = (
        url_col.contains("/download/")
        & ~url_col.contains("?")
        & ~url_col.endswith("/")
        & ~looks_like_file
    )
    return F.when(needs_slash, F.concat(url_col, F.lit("/"))).otherwise(url_col)


def scrape_document(pages: DataFrame, url_col: str = "url", html_col: str = "html",
                    downloads_col: str | None = None,
                    scraper_type: str = "basic") -> DataFrame:
    """scrapeDocument's 4-way branch (scrapeDocument.ts:259-319) as one
    projection, branch-exact. Priority (first match wins, mirroring the
    sequential returns):

    1. downloads present → direct-download DocumentResult:
       url = download.url || actualUrl, type = download.contentType ||
       inferContentType(filename), title = filename, empty text,
       complete = content present AND no error      scrapeDocument.ts:259-281
    2. detector chain hit → re-enqueue signal: detected doc URL,
       complete=false, no title/description         scrapeDocument.ts:283-298
    3. PDF-page heuristic → type application/pdf, text = the RAW content
       (the reference passes PDF bytes through as text), no metadata
                                                    scrapeDocument.ts:300-304
    4. else → stripped text + metadata; strategy = the scraper's type
       ('basic'|'tree'), complete = metrics.complete scrapeDocument.ts:305-319

    Output columns: url (normalized source), doc_url (≙ DocumentResult.url),
    type, text, title, description, filename, content_type, file_content,
    is_pdf, is_download, complete, strategy.
    """
    pages = pages.withColumn("_norm_url", _norm_download_url(F.col(url_col)))
    parsed = parse_pages(pages, "_norm_url", html_col)

    has_download = (
        (F.size(F.coalesce(F.col(downloads_col), F.array())) > 0)
        if downloads_col
        else F.lit(False)
    )
    detected = F.col("parsed.detected")
    html_str = F.col(html_col).cast("string")
    is_pdf_page = udfs.col_is_pdf_page(F.col("_norm_url"), html_str)

    if downloads_col:
        first_dl = F.element_at(F.col(downloads_col), 1)
        dl_filename = F.coalesce(first_dl["filename"], F.lit(""))
        dl_type = F.coalesce(first_dl["content_type"], udfs.col_infer_content_type(dl_filename))
        dl_url = F.coalesce(first_dl["url"], F.col("_norm_url"))
        dl_complete = first_dl["content"].isNotNull() & first_dl["error"].isNull()
        dl_is_pdf = udfs.col_is_pdf_file(dl_filename)
    else:
        first_dl = None
        dl_filename = dl_type = dl_url = F.lit(None).cast("string")
        dl_complete = dl_is_pdf = F.lit(False)

    doc_url = (
        F.when(has_download, dl_url)
        .when(detected.isNotNull(), detected["url"])
        .otherwise(F.col("_norm_url"))
    )
    mime = (
        F.when(has_download, dl_type)
        .when(detected.isNotNull(), detected["type"])
        .when(is_pdf_page, F.lit("application/pdf"))
        .otherwise(F.lit("text/html"))
    )
    text = (
        F.when(has_download, F.lit(""))
        .when(detected.isNotNull(), F.lit(""))
        # the reference returns the raw content as text for PDF pages
        .when(is_pdf_page, html_str)
        .otherwise(F.col("parsed.text"))
    )
    # metadata only exists on the plain-HTML branch (the reference skips
    # extractHtmlMetadata for PDFs and emits none for downloads/detections)
    plain = ~has_download & detected.isNull() & ~is_pdf_page
    title = F.when(has_download, first_dl["filename"] if first_dl is not None else F.lit(None)).when(
        plain, F.col("parsed.title")
    )
    description = F.when(plain, F.col("parsed.description"))
    complete = (
        F.when(has_download, dl_complete)
        .when(detected.isNotNull(), F.lit(False))
        .otherwise(F.lit(True))  # basic scraper metrics.complete is always true
    )
    strategy = (
        F.when(has_download, F.lit("direct-download"))
        .when(detected.isNotNull(), detected["strategy"])
        .otherwise(F.lit(scraper_type))
    )
    is_pdf = (
        F.when(has_download, dl_is_pdf)
        .when(detected.isNotNull(), detected["is_pdf"])
        .otherwise(is_pdf_page)
    )

    return parsed.select(
        F.col("_norm_url").alias("url"),
        doc_url.alias("doc_url"),
        mime.alias("type"),
        text.alias("text"),
        title.alias("title"),
        description.alias("description"),
        F.when(has_download, first_dl["filename"] if first_dl is not None else F.lit(None)).alias("filename"),
        F.when(has_download, dl_type).alias("content_type"),
        (F.when(has_download, first_dl["content"]) if first_dl is not None
         else F.lit(None).cast("binary")).alias("file_content"),
        is_pdf.alias("is_pdf"),
        has_download.alias("is_download"),
        complete.alias("complete"),
        strategy.alias("strategy"),
    )


def live_fetch_pages(urls: DataFrame, transport=None, **kw) -> DataFrame:
    """The LIVE network adapter behind the same registry seam: a URL
    table (not pre-materialized pages) through the mapInPandas HTTP fetch
    implementing the simple.ts:94-120 contract — see spider_spark.fetch.
    ``transport`` is injectable (None = stdlib urllib) so the adapter is
    fully testable offline; the crawl tick uses it via
    CrawlConfig(adapter='live')."""
    from . import fetch

    return fetch.live_fetch(urls, transport, **kw)


# built-in adapters (registered at import; 'crawlee' needs a live browser
# per row — out of scope in a distributed engine (SURVEY §2.1); its
# observable semantics (expansion census, downloads, skip-links) live in
# scrapers.py)
_FETCH_ADAPTERS.update(
    {
        "simple": simple_fetch_pages,
        "dom": dom_fetch_pages,
        "crawl4ai": crawl4ai_pages,
        "live": live_fetch_pages,
    }
)
