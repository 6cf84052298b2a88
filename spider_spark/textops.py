"""Byte-identical scalar extraction core (pure Python, no Spark).

Each function reproduces a reference operator's output byte-for-byte; the
cited regexes are ported with JS-equivalent semantics (explicit JS whitespace
character classes instead of Python's ``\\s``, ASCII word boundaries instead
of Python's Unicode ``\\b``).  Vectorized wrappers live in
``spider_spark.udfs``; parity is asserted in tests/ against golden fixtures
and a Node differential oracle.

Reference citations (all /root/reference/):
- stripHtmlToText / extractHtmlMetadata  src/scrapeDocument.ts:192-214
- decodeHtmlEntities / makeAbsoluteUrl   src/scrapeDocument/detectors.ts:13-28
- WPDM / CivicWeb / DocuShare detectors  src/scrapeDocument/detectors.ts:30-193
- normalizeDownloadPageUrl               src/scrapeDocument.ts:129-148
- extractHtmlLinks / splitClasses        src/shared/links.ts:4-48
- filterLinks                            src/platform/link-filter.ts:24-66
- inferContentType / isPdfFile           src/shared/download-utils.ts:8-73
- findDocumentLinks extension filter     src/scrapeDocument.ts:333-360
- createCacheKey / stableStringify       src/shared/cache.ts:48-105
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass
from html.parser import HTMLParser

from .urlops import resolve_href, whatwg_resolve, URLParseError

__all__ = [
    "JS_WS",
    "js_trim",
    "normalize_html",
    "strip_html_to_text",
    "extract_html_metadata",
    "decode_html_entities",
    "make_absolute_url",
    "normalize_download_page_url",
    "infer_content_type",
    "is_pdf_file",
    "is_pdf_page",
    "extract_wordpress_download_url",
    "extract_civicweb_document_url",
    "extract_docushare_document_url",
    "detect_document_url",
    "Link",
    "split_classes",
    "extract_html_links",
    "filter_links",
    "find_document_links_from",
    "DEFAULT_DOC_EXTENSIONS",
    "stable_stringify",
    "create_cache_key",
    "normalize_cache_key_part",
    "adapter_cache_key",
    "default_headers",
    "UNDEFINED",
    "is_download_error",
]

# ECMA-262 WhiteSpace \u222a LineTerminator \u2014 what JS /\\s/ matches and
# .trim() strips. Differs from Python \\s: JS includes U+FEFF; Python adds
# \\x1c-\\x1f and \\x85. Built from explicit escapes so both engines agree
# byte-for-byte.
_JS_WS_CHARS = (
    "\t\n\v\f\r \u00a0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000\ufeff"
)
JS_WS = re.escape(_JS_WS_CHARS)
_JS_WS_SET = _JS_WS_CHARS
_WS_RUN_RE = re.compile(f"[{JS_WS}]+")

# JS \b is an ASCII word boundary; after a word char it asserts the next char
# is not [0-9A-Za-z_]. Python's \b is Unicode-aware, so spell it out.
_NOT_WORD = r"(?![0-9A-Za-z_])"
_SCRIPT_RE = re.compile(r"<script" + _NOT_WORD + r"[^<]*(?:(?!</script>)<[^<]*)*</script>", re.IGNORECASE)
_STYLE_RE = re.compile(r"<style" + _NOT_WORD + r"[^<]*(?:(?!</style>)<[^<]*)*</style>", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")

_TITLE_RE = re.compile(r"<title[^>]*>([^<]+)</title>", re.IGNORECASE)
_DESC_RE = re.compile(r"""<meta[^>]+name=["']description["'][^>]+content=["']([^"']+)["']""", re.IGNORECASE)

_WPDM_LINK_RE = re.compile(r"""href=["']([^"']*wpdmdl=\d+[^"']*)["']""", re.IGNORECASE)
_PDF_LINK_RE = re.compile(r"""href=["']([^"']*\.pdf[^"']*)["']""", re.IGNORECASE)
_CIVICWEB_RE = re.compile(r"""href=["'](/filepro/document/\d+/[^"']+\.pdf)["']""", re.IGNORECASE)
_DOCUSHARE_RES = [
    re.compile(r"""href=["'](/dsweb/Get/Document-\d+/[^"']+\.(pdf|doc|docx|xls|xlsx|ppt|pptx))["']""", re.IGNORECASE),
    re.compile(r"""href=["'](/dsweb/ServicesLib/Document-\d+/[^"']+\.(pdf|doc|docx|xls|xlsx|ppt|pptx))["']""", re.IGNORECASE),
    re.compile(r"""href=["'](/[^"']*(?:docushare|dsweb)[^"']+\.(pdf|doc|docx|xls|xlsx|ppt|pptx))["']""", re.IGNORECASE),
]
_FILE_EXT_RE = re.compile(r"\.[a-z0-9]{2,8}$", re.IGNORECASE)


def js_trim(s: str) -> str:
    """JS String.prototype.trim — strips the JS whitespace set."""
    return s.strip(_JS_WS_SET)


def normalize_html(html: str) -> str:
    """DomAdapter.processHtml (dom.ts:36-49): happy-dom's
    ``documentElement.innerHTML = html; return outerHTML`` round trip,
    re-expressed per the WHATWG fragment parse/serialize algorithms the
    library implements (``domnorm.whatwg_normalize_html`` — implemented
    subset and documented divergences in that module's docstring). On
    failure return the input unchanged (dom.ts:43-48's catch). Idempotent
    and deterministic — the ``adapter='dom'`` variant of the fetch
    stage."""
    from .domnorm import whatwg_normalize_html

    try:
        return whatwg_normalize_html(html)
    except Exception:
        return html


def strip_html_to_text(html: str) -> str:
    """stripHtmlToText (scrapeDocument.ts:207-214), byte-identical."""
    s = _SCRIPT_RE.sub("", html)
    s = _STYLE_RE.sub("", s)
    s = _TAG_RE.sub(" ", s)
    s = _WS_RUN_RE.sub(" ", s)
    return js_trim(s)


def extract_html_metadata(html: str) -> dict:
    """extractHtmlMetadata (scrapeDocument.ts:192-205): title + description."""
    t = _TITLE_RE.search(html)
    d = _DESC_RE.search(html)
    return {
        "title": js_trim(t.group(1)) if t else None,
        "description": js_trim(d.group(1)) if d else None,
    }


def decode_html_entities(value: str) -> str:
    """Exactly 5 sequential replaces (detectors.ts:13-20) — NOT a general
    unescape: '&amp;quot;' decodes all the way to '"' because the replaces
    chain, and no other entities are touched."""
    return (
        value.replace("&amp;", "&")
        .replace("&quot;", '"')
        .replace("&#039;", "'")
        .replace("&lt;", "<")
        .replace("&gt;", ">")
    )


def make_absolute_url(url: str, base_url: str) -> str:
    """makeAbsoluteUrl (detectors.ts:22-28): entity-decode then resolve;
    fall back to the decoded string on parse failure."""
    decoded = decode_html_entities(url)
    try:
        return whatwg_resolve(decoded, base_url)
    except (URLParseError, ValueError):
        return decoded


def normalize_download_page_url(url: str) -> str:
    """normalizeDownloadPageUrl (scrapeDocument.ts:129-148)."""
    try:
        from .urlops import parse_url

        pathname = parse_url(url).path
        looks_like_file = bool(_FILE_EXT_RE.search(pathname))
    except (URLParseError, ValueError):
        looks_like_file = bool(_FILE_EXT_RE.search(url.split("?")[0] or url))
    if "/download/" in url and "?" not in url and not url.endswith("/") and not looks_like_file:
        return url + "/"
    return url


_MIME_TYPES = {
    ".pdf": "application/pdf",
    ".doc": "application/msword",
    ".docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    ".xls": "application/vnd.ms-excel",
    ".xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    ".ppt": "application/vnd.ms-powerpoint",
    ".pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    ".odt": "application/vnd.oasis.opendocument.text",
    ".ods": "application/vnd.oasis.opendocument.spreadsheet",
    ".odp": "application/vnd.oasis.opendocument.presentation",
    ".rtf": "application/rtf",
    ".txt": "text/plain",
    ".csv": "text/csv",
    ".zip": "application/zip",
    ".rar": "application/vnd.rar",
    ".7z": "application/x-7z-compressed",
    ".tar": "application/x-tar",
    ".gz": "application/gzip",
    ".jpg": "image/jpeg",
    ".jpeg": "image/jpeg",
    ".png": "image/png",
    ".gif": "image/gif",
    ".webp": "image/webp",
    ".svg": "image/svg+xml",
    ".mp3": "audio/mpeg",
    ".mp4": "video/mp4",
    ".wav": "audio/wav",
    ".avi": "video/x-msvideo",
    ".html": "text/html",
    ".htm": "text/html",
    ".xml": "application/xml",
    ".json": "application/json",
}
_LAST_EXT_RE = re.compile(r"\.[^.]+$")


def infer_content_type(filename: str | None) -> str:
    """inferContentType (download-utils.ts:59-66)."""
    if not filename:
        return "application/octet-stream"
    m = _LAST_EXT_RE.search(filename.lower())
    if not m:
        return "application/octet-stream"
    return _MIME_TYPES.get(m.group(0), "application/octet-stream")


def is_pdf_file(filename: str | None) -> bool:
    """isPdfFile (download-utils.ts:71-73)."""
    return bool(filename) and filename.lower().endswith(".pdf")


def is_download_error(error_message: str | None) -> bool:
    """isDownloadError (download-utils.ts:121-126): the message indicates a
    browser download was triggered rather than a navigation failure."""
    if not error_message:
        return False
    return "Download is starting" in error_message or "net::ERR_ABORTED" in error_message


def is_pdf_page(url: str, content: str) -> bool:
    """PDF-page heuristic (scrapeDocument.ts:300-303)."""
    return url.lower().endswith(".pdf") or "application/pdf" in content or "%PDF-" in content


# --- document-URL detectors (first-match-wins chain) ---


def extract_wordpress_download_url(url: str, html: str) -> str | None:
    """detectors.ts:30-86 — incl. the wpdmdl= anti-loop guard (issue sdk#440)."""
    if "wpdmdl=" in url:
        return None
    is_wpdm_page = "/download/" in url or "wpdm-download-link" in html or "wpdm_view_count" in html
    if not is_wpdm_page:
        return None
    m = _WPDM_LINK_RE.search(html)
    if m:
        return make_absolute_url(m.group(1), url)
    m = _PDF_LINK_RE.search(html)
    if m:
        return make_absolute_url(m.group(1), url)
    return None


def extract_civicweb_document_url(url: str, html: str) -> str | None:
    """detectors.ts:88-109."""
    is_preview = "/filepro/documents/?preview=" in url or ("civicweb.net" in url and "/filepro/documents" in url)
    if not is_preview:
        return None
    m = _CIVICWEB_RE.search(html)
    if not m:
        return None
    return make_absolute_url(m.group(1), url)


def extract_docushare_document_url(url: str, html: str) -> str | None:
    """detectors.ts:111-140."""
    is_ds = (
        "/docushare/dsweb/" in url
        or "DocuShare" in url
        or "DocuShare" in html
        or "/dsweb/Get/" in html
        or "/dsweb/ServicesLib/" in html
    )
    if not is_ds:
        return None
    for pat in _DOCUSHARE_RES:
        m = pat.search(html)
        if m:
            return make_absolute_url(m.group(1), url)
    return None


def detect_document_url(url: str, html: str) -> dict | None:
    """detectDocumentUrl (detectors.ts:142-193): ordered WPDM → CivicWeb →
    DocuShare chain, first match wins."""
    u = extract_wordpress_download_url(url, html)
    if u:
        return {"url": u, "type": "application/pdf", "is_pdf": True, "strategy": "wordpress-pdf-link"}
    u = extract_civicweb_document_url(url, html)
    if u:
        return {"url": u, "type": "application/pdf", "is_pdf": True, "strategy": "civicweb-pdf-link"}
    u = extract_docushare_document_url(url, html)
    if u:
        is_pdf = u.lower().endswith(".pdf")
        return {
            "url": u,
            "type": "application/pdf" if is_pdf else "application/octet-stream",
            "is_pdf": is_pdf,
            "strategy": "docushare-doc-link",
        }
    return None


# --- link extraction ---


@dataclass
class Link:
    href: str
    text: str = ""
    title: str | None = None
    aria_label: str | None = None
    rel: str | None = None
    target: str | None = None
    classes: list[str] | None = None


def split_classes(value: str | None) -> list[str] | None:
    """splitClasses (links.ts:4-7): split on JS \\s+, drop empties, None if none."""
    if value is None:
        return None
    classes = [c for c in _WS_RUN_RE.split(value) if js_trim(c)]
    return classes or None


class _AnchorParser(HTMLParser):
    """Document-order <a href> scan matching cheerio's $('a[href]') + .text():
    per-anchor attrs + concatenated descendant text. HTML-spec behavior a
    nested <a> implicitly closes the open one (parse5 does the same)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[dict, list[str]]] = []
        self._open: tuple[dict, list[str]] | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._close()
            d = {}
            for k, v in attrs:
                if k not in d:  # first attr wins, like parse5
                    d[k] = v if v is not None else ""
            self._open = (d, [])
            self.anchors.append(self._open)

    def handle_startendtag(self, tag, attrs):
        if tag == "a":
            self.handle_starttag(tag, attrs)
            self._close()

    def handle_endtag(self, tag):
        if tag == "a":
            self._close()

    def handle_data(self, data):
        if self._open is not None:
            self._open[1].append(data)

    def _close(self):
        self._open = None


def extract_html_links(html: str, base_url: str) -> list[Link]:
    """extractHtmlLinks (links.ts:17-48): a[href] scan in document order,
    resolve against base, keep-first dedupe on the absolute href."""
    parser = _AnchorParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass  # malformed HTML: keep whatever was parsed (cheerio never throws)
    links: list[Link] = []
    seen: set[str] = set()
    for attrs, text_parts in parser.anchors:
        href = attrs.get("href")
        if not href:
            continue
        absolute = resolve_href(href, base_url)
        if absolute in seen:
            continue
        seen.add(absolute)
        links.append(
            Link(
                href=absolute,
                text=js_trim("".join(text_parts)) or "",
                title=attrs.get("title"),
                aria_label=attrs.get("aria-label"),
                rel=attrs.get("rel"),
                target=attrs.get("target"),
                classes=split_classes(attrs.get("class")),
            )
        )
    return links


def filter_links(links: list[Link], config: dict | None = None) -> list[Link]:
    """filterLinks (link-filter.ts:24-66): include-union on href/text
    contains (case-insensitive), then excludes, then keep-first dedupe on the
    ORIGINAL-case href."""
    config = config or {}
    url_needles = [s.lower() for s in config.get("urlContains") or []]
    text_needles = [s.lower() for s in config.get("textContains") or []]
    exclude_needles = [s.lower() for s in config.get("excludes") or []]
    has_include = bool(url_needles or text_needles)
    dedupe = config.get("dedupe", True)
    seen: set[str] = set()
    out: list[Link] = []
    for link in links:
        href = (link.href or "").lower()
        text = (link.text or "").lower()
        if not href:
            continue
        if has_include:
            if not (any(n in href for n in url_needles) or any(n in text for n in text_needles)):
                continue
        if any(n in href or n in text for n in exclude_needles):
            continue
        if dedupe:
            if link.href in seen:
                continue
            seen.add(link.href)
        out.append(link)
    return out


def extract_markdown(markdown_field) -> str | None:
    """Crawl4aiAdapter.extractMarkdown (crawl4ai.ts:114-125): the markdown
    field may be a plain string or an object — prefer ``fit_markdown``,
    else ``raw_markdown``, else None."""
    if markdown_field is None:
        return None
    if isinstance(markdown_field, str):
        return markdown_field
    if isinstance(markdown_field, dict):
        return markdown_field.get("fit_markdown") or markdown_field.get("raw_markdown") or None
    return None


def is_skip_link(href: str | None, text: str | None) -> bool:
    """Crawlee expansion skip heuristic (crawlee.ts:137-143): during
    expansion, skip ``a[href="#"]`` anchors whose text contains skip/menu
    or is longer than 100 chars."""
    if href != "#":
        return False
    t = (text or "").lower()
    return "skip" in t or "menu" in t or len(text or "") > 100


DEFAULT_DOC_EXTENSIONS = [".pdf", ".doc", ".docx", ".txt", ".md", ".rtf"]


def find_document_links_from(links: list[Link], extensions: list[str] | None = None) -> list[str]:
    """findDocumentLinks filter stage (scrapeDocument.ts:333-360): suffix
    match on lowercase href, unique keep-first."""
    exts = extensions or DEFAULT_DOC_EXTENSIONS
    hrefs = [l.href for l in links if any(l.href.lower().endswith(e) for e in exts)]
    out, seen = [], set()
    for h in hrefs:
        if h not in seen:
            seen.add(h)
            out.append(h)
    return out


# --- cache keys (the url_seen / fetch_cache identity discipline) ---


class _Undefined:
    """Sentinel for JS ``undefined`` (distinct from None ≙ null)."""


UNDEFINED = _Undefined()


def _js_json_str(s: str) -> str:
    """JSON.stringify for a string — Python's json escapes match JS for all
    BMP text (short escapes for \\b\\f\\n\\r\\t, \\uXXXX for other controls)."""
    return json.dumps(s, ensure_ascii=False)


def stable_stringify(value) -> str:
    """stableStringify (cache.ts:70-105), mirrored recursion: primitives via
    JSON.stringify; arrays element-wise; objects with undefined values
    dropped and keys sorted; ``UNDEFINED``→'undefined', None→'null'.

    Python None maps to JS null (kept in output); pass ``UNDEFINED`` for the
    JS undefined drop/'undefined' semantics."""
    if value is UNDEFINED:
        return "undefined"
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, str):
        return _js_json_str(value)
    if isinstance(value, (int, float)):
        return json.dumps(value)
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(stable_stringify(v) for v in value) + "]"
    if isinstance(value, dict):
        entries = sorted(
            ((k, v) for k, v in value.items() if v is not UNDEFINED),
            key=lambda kv: _locale_key(kv[0]),
        )
        return "{" + ",".join(f"{_js_json_str(k)}:{stable_stringify(v)}" for k, v in entries) + "}"
    return _js_json_str(str(value))


def _locale_key(s: str):
    """Sort key approximating JS ``a.localeCompare(b)`` (ICU root collation)
    for the ASCII config keys cache keys actually contain: primary strength
    is case-insensitive alphabetic ('accept' < 'DNT', unlike codepoint
    order), tertiary prefers lowercase ('a' < 'A'). Verified against Node
    in tests/test_fuzz_differential.py."""
    return (s.casefold(), tuple(1 if c.isupper() else 0 for c in s), s)


def normalize_cache_key_part(part) -> str | None:
    """normalizeCacheKeyPart (cache.ts:62-68): each part is itself
    stableStringified into a STRING, which the outer stringify then
    JSON-quotes (double encoding)."""
    if part is UNDEFINED:
        return None
    return stable_stringify(part)


def create_cache_key(namespace: str, url: str, parts: list | None = None) -> str:
    """createCacheKey (cache.ts:48-60): '{namespace}:{sha256hex}' over
    stableStringify({parts: parts.map(normalizeCacheKeyPart), url}) — note
    the DOUBLE encoding: each part becomes a JSON string inside the outer
    JSON (['{"a":1}'] not [{"a":1}]), byte-identical to the reference."""
    sig_parts = [p for p in map(normalize_cache_key_part, parts or []) if p is not None]
    signature = stable_stringify({"parts": sig_parts, "url": url})
    digest = hashlib.sha256(signature.encode("utf-8")).hexdigest()
    return f"{namespace}:{digest}"


# Per-adapter cache-key part composition — config knobs folded into the key
# exactly like the reference adapters, so config changes never collide
# (tested in index.spec.ts:206-237 / scrapers.spec.ts:220-266).

DEFAULT_HEADERS_UA = "Mozilla/5.0 (compatible; HappyVertical Spider/2.0; +https://happyvertical.com/bot)"


def default_headers(user_agent: str | None = None, headers: dict | None = None) -> dict:
    """simple.ts:64-75 / dom.ts:84-95: bot default header set, user headers
    win (spread-right)."""
    base = {
        "User-Agent": user_agent or DEFAULT_HEADERS_UA,
        "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
        "Accept-Language": "en-US,en;q=0.5",
        "DNT": "1",
        "Connection": "keep-alive",
        "Upgrade-Insecure-Requests": "1",
    }
    base.update(headers or {})
    return base


def adapter_cache_key(adapter: str, url: str, config: dict | None = None) -> str:
    """Per-adapter key composition:
    - simple:   ('simple', url, [defaultHeaders])      simple.ts:76
    - dom:      ('dom', url, [defaultHeaders])         dom.ts:96
    - crawlee:  (headless, UA, headers, stealth, executablePath,
                 cloak.humanize, cloak.executablePath, cloak.autoUpdate)
                                                       crawlee.ts:46-66
    - crawl4ai: (serverUrl, headless, UA, waitUntil)   crawl4ai.ts:168-173
    - tree:     all expansion knobs + headers + timeout tree.ts:97-122

    Per-knob default fidelity matters: a knob the reference resolves with a
    default before keying (crawlee/crawl4ai headless, crawl4ai
    serverUrl/waitUntil, tree maxIterations/clickDelay/rateLimit) keeps
    that default here; a knob passed through RAW (tree headless/stealth,
    every userAgent, cloak fields…) maps to UNDEFINED when absent, which
    createCacheKey drops — injecting a default there would hash different
    bytes than the reference for the same config. (The reference's
    resolveBrowserExecutablePath environment probe is not reproduced —
    executablePath is keyed raw; document-level divergence.)
    """
    c = config or {}
    get = lambda k, d=UNDEFINED: c.get(k, d)
    if adapter in ("simple", "dom"):
        parts = [default_headers(c.get("userAgent"), c.get("headers"))]
    elif adapter == "crawlee":
        parts = [
            get("headless", True),  # options.headless !== false (crawlee.ts:39)
            get("userAgent"),
            get("headers", {}),
            get("stealth"),
            get("executablePath"),
            get("cloakHumanize"),
            get("cloakExecutablePath"),
            get("cloakAutoUpdate"),
        ]
    elif adapter == "crawl4ai":
        parts = [
            get("serverUrl", "http://localhost:11235"),  # crawl4ai.ts:51,154
            get("headless", True),  # crawl4ai.ts:52
            get("userAgent"),
            get("waitUntil", "networkidle"),  # crawl4ai.ts:54
        ]
    elif adapter == "tree":
        parts = [
            get("maxIterations", 10),  # tree.ts:98 (?? DEFAULT)
            get("clickDelay", 100),
            get("rateLimit", 1000),
            get("customSelectors"),
            get("handleExclusive"),
            get("headless"),  # tree.ts:112 — RAW, no default
            get("userAgent"),
            get("headers"),
            get("timeout"),
            get("stealth"),  # tree.ts:117 — RAW
            get("executablePath"),
            get("cloakHumanize"),
            get("cloakExecutablePath"),
            get("cloakAutoUpdate"),
        ]
    else:
        parts = []
    return create_cache_key(adapter, url, parts)
