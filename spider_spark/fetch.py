"""Live HTTP fetch adapter — the production fetch stage behind the
pluggable registry seam (scrape.register_fetch_adapter).

Implements the SimpleAdapter fetch contract
(/root/reference/src/adapters/simple.ts:94-120) as an
``Iterator[pd.DataFrame]`` mapInPandas stage over a selected (politeness-
bounded) frontier batch:

- default header set verbatim from simple.ts:64-75 (bot User-Agent,
  Accept, Accept-Language, DNT, Connection, Upgrade-Insecure-Requests),
  user headers win on key conflict (JS spread semantics);
- follows ≤ MAX_REDIRECTS redirect hops and records the FINAL URL
  (simple.ts:115-120's ``context.history`` contract) — links downstream
  resolve against it;
- a chain still redirecting after the limit maps to status 599, the same
  divergence-by-strictness as frontier.resolve_redirects (the reference's
  undici interceptor would return the 3xx body instead — documented);
- HTTP ≥ 400 becomes a STATUS ROW, not an exception (NetworkError made
  row-wise — exceptions don't scale row-wise, SURVEY §2.14), and transport
  failures (timeout, refused, DNS) map to status 599 with the message in
  ``fetch_error``;
- per-request timeout (reference default 30 s, types.ts:127).

The TRANSPORT is injectable: any picklable callable
``(url, headers, timeout) -> (status, resp_headers, body_bytes)`` that
performs ONE request hop with redirects NOT followed (the adapter owns the
hop loop so the ≤5 rule and final-URL capture are transport-independent).
``urllib_transport`` is the stdlib production default;
``make_table_transport`` builds an offline fake from (url → html) and
(src → location) dicts so the adapter is fully testable without a network
— and so the crawl tick's join path and live path can be differentially
tested on the same synthetic corpus (tests/test_live_fetch.py).

Politeness note: the per-host budget is enforced UPSTREAM (the selected
batch is already politeness-gated by frontier.politeness_tag); inter-
request crawl-delay pacing within a tick is a deployment concern of the
transport (e.g. a rate-limited connection pool), kept out of the row
semantics so the stage stays deterministic and replay-exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: simple.ts:64-75 — the reference's default request headers. User headers
#: merge over these with user-precedence ({...defaultHeaders, ...headers}).
DEFAULT_USER_AGENT = (
    "Mozilla/5.0 (compatible; HappyVertical Spider/2.0; +https://happyvertical.com/bot)"
)
DEFAULT_HEADERS = {
    "User-Agent": DEFAULT_USER_AGENT,
    "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
    "Accept-Language": "en-US,en;q=0.5",
    "DNT": "1",
    "Connection": "keep-alive",
    "Upgrade-Insecure-Requests": "1",
}

#: The reference's fetch() runs on undici, which ADDS accept-encoding and
#: transparently decompresses per the Fetch spec — it is not part of the
#: simple.ts:64-75 literal header set, so it lives in its own constant and
#: a user-supplied Accept-Encoding always wins. Only codings the stdlib
#: can undo are advertised (no brotli/zstd in this container).
ACCEPT_ENCODING = "gzip, deflate"

MAX_REDIRECTS = 5  # simple.ts:100 / frontier.MAX_REDIRECTS — one rule
DEFAULT_TIMEOUT = 30.0  # types.ts:127 (ms in the reference; seconds here)

_REDIRECT_STATUSES = frozenset({301, 302, 303, 307, 308})

FETCH_FIELDS = [
    StructField("final_url", StringType(), True),
    StructField("html", BinaryType(), True),
    StructField("status", IntegerType(), True),
    StructField("fetch_error", StringType(), True),
    StructField("etag", StringType(), True),
    StructField("last_modified", StringType(), True),
]


def merge_headers(headers: dict | None, user_agent: str | None = None) -> dict:
    """loadEnvConfig + header merge (simple.ts:36-43,64-75): defaults,
    userAgent override slot, then user headers win key-by-key."""
    out = dict(DEFAULT_HEADERS)
    if user_agent:
        out["User-Agent"] = user_agent
    out.update(headers or {})
    return out


def _header(resp_headers: dict | None, name: str) -> str | None:
    """Case-insensitive single-header lookup (HTTP field names are
    case-insensitive; transports differ in what casing they surface)."""
    lname = name.lower()
    for k, v in (resp_headers or {}).items():
        if k.lower() == lname:
            return v
    return None


def decode_content(body: bytes, content_encoding: str | None) -> bytes:
    """Undo Content-Encoding the way the reference's undici fetch does
    transparently. Codings apply right-to-left over the comma list
    (RFC 9110 §8.4); 'deflate' tries zlib-wrapped first then raw — real
    servers ship both under the same label. Unknown codings raise
    ValueError (the caller turns that into a status row, not a task
    failure)."""
    import gzip as _gzip
    import zlib as _zlib

    if not content_encoding or body is None:
        return body
    for coding in reversed([c.strip().lower() for c in content_encoding.split(",") if c.strip()]):
        if coding in ("identity", ""):
            continue
        if coding in ("gzip", "x-gzip"):
            body = _gzip.decompress(body)
        elif coding == "deflate":
            try:
                body = _zlib.decompress(body)
            except _zlib.error:
                body = _zlib.decompress(body, -_zlib.MAX_WBITS)
        else:
            raise ValueError(f"unsupported content-encoding: {coding}")
    return body


def urllib_transport(url: str, headers: dict, timeout: float):
    """Production one-hop transport on stdlib urllib: redirects NOT
    followed (the adapter owns the hop loop), any HTTP status returned as
    data. Module-level and closure-free → pickles into executors."""
    import urllib.request

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, hdrs, newurl):
            return None

    opener = urllib.request.build_opener(_NoRedirect)
    req = urllib.request.Request(url, headers=headers, method="GET")
    try:
        with opener.open(req, timeout=timeout) as resp:
            return resp.status, dict(resp.headers.items()), resp.read()
    except urllib.error.HTTPError as e:  # non-2xx lands here, incl. 3xx
        body = e.read() if e.fp is not None else b""
        return e.code, dict(e.headers.items()) if e.headers else {}, body


def make_table_transport(
    pages: dict[str, bytes],
    redirects: dict[str, str] | None = None,
    etags: dict[str, str] | None = None,
    last_modified: dict[str, str] | None = None,
    gzip_urls: set[str] | frozenset[str] | None = None,
):
    """Offline fake transport from lookup tables — the unit-test and
    differential-test seam. Known URLs → (200, html bytes); redirect
    sources → (301, Location); everything else → (404, b'').

    Optional HTTP-semantics tables: ``etags``/``last_modified`` attach
    validators to responses AND honor If-None-Match / If-Modified-Since
    (exact-match revalidation → 304 with no body, like a well-behaved
    origin); ``gzip_urls`` serves those URLs gzip-compressed with
    ``Content-Encoding: gzip`` so the decode path is exercised offline."""
    redirects = dict(redirects or {})
    pages = dict(pages)
    etags = dict(etags or {})
    last_modified = dict(last_modified or {})
    gzip_urls = frozenset(gzip_urls or ())

    def transport(url: str, headers: dict, timeout: float):
        if url in redirects:
            return 301, {"Location": redirects[url]}, b""
        if url in pages:
            resp = {"Content-Type": "text/html"}
            if url in etags:
                resp["ETag"] = etags[url]
            if url in last_modified:
                resp["Last-Modified"] = last_modified[url]
            sent_inm = next((v for k, v in headers.items() if k.lower() == "if-none-match"), None)
            sent_ims = next((v for k, v in headers.items() if k.lower() == "if-modified-since"), None)
            if (sent_inm is not None and sent_inm == etags.get(url)) or (
                sent_inm is None and sent_ims is not None and sent_ims == last_modified.get(url)
            ):
                return 304, resp, b""
            body = pages[url]
            if isinstance(body, str):
                body = body.encode("utf-8")
            if url in gzip_urls:
                import gzip as _gzip

                body = _gzip.compress(body)
                resp["Content-Encoding"] = "gzip"
            return 200, resp, body
        return 404, {}, b""

    return transport


def _resolve_location(base: str, location: str) -> str:
    """Location headers may be relative (RFC 9110 §10.2.2); resolve against
    the current hop with the same WHATWG resolver the link extractor uses,
    so live final URLs and join-path final URLs canonicalize identically."""
    from . import urlops

    resolved = urlops.resolve_href(location, base)
    return resolved if resolved is not None else location


def fetch_one(url: str, transport, headers: dict, timeout: float):
    """One frontier row through the redirect-following fetch contract.
    Returns (final_url, html_bytes | None, status, error | None,
    etag | None, last_modified | None).

    - Content-Encoding is undone transparently (``decode_content``) — a
      body that fails to decode becomes a 599 status row, never a task
      failure;
    - 304 Not Modified (the conditional-request success) passes through
      as its own status with no body — the caller keeps its cached copy;
    - response ETag / Last-Modified validators are captured so the next
      crawl of this URL can revalidate instead of refetch."""
    current = url
    try:
        for _hop in range(MAX_REDIRECTS + 1):
            status, resp_headers, body = transport(current, headers, timeout)
            if status in _REDIRECT_STATUSES:
                loc = _header(resp_headers, "Location")
                if loc is None:
                    # a redirect status with no Location is a dead hop
                    return current, None, int(status), "redirect without Location", None, None
                if _hop == MAX_REDIRECTS:
                    # still redirecting after the limit → 599, like
                    # frontier.resolve_redirects (strict divergence)
                    return current, None, 599, "too many redirects", None, None
                current = _resolve_location(current, loc)
                continue
            etag = _header(resp_headers, "ETag")
            last_mod = _header(resp_headers, "Last-Modified")
            if status == 304:
                # Not Modified: our cached copy is current (RFC 9110 §15.4.5)
                return current, None, 304, None, etag, last_mod
            if status >= 400:
                # NetworkError → status row (simple.ts:104-109 made row-wise)
                return current, None, int(status), f"HTTP {status}", etag, last_mod
            if body is not None:
                body = decode_content(bytes(body), _header(resp_headers, "Content-Encoding"))
            return current, body, int(status), None, etag, last_mod
    except Exception as e:  # timeout / refused / DNS — undici throw path
        return current, None, 599, f"{type(e).__name__}: {e}", None, None
    return current, None, 599, "unreachable", None, None


def fetch_rows(
    url_list: list, hdrs_list: list, transport, timeout: float, concurrency: int = 1
) -> list:
    """Fetch a batch of (url, headers) rows through ``fetch_one``,
    preserving input order. ``concurrency=1`` is the strict sequential
    loop; >1 overlaps requests on a per-partition thread pool — the
    Python-side analog of the reference's ``Promise.all`` batching
    (README.md:488-502). Threads are the right tool here: the stage is
    network-bound (the GIL is released during socket waits), each
    ``fetch_one`` owns its full redirect chain, and
    ``ThreadPoolExecutor.map`` reassembles results in submission order,
    so concurrent output is row-identical to sequential. Politeness is
    enforced UPSTREAM on the selected batch; concurrency here only
    overlaps the already-budgeted requests of one partition."""
    if concurrency <= 1 or len(url_list) <= 1:
        return [fetch_one(u, transport, h, timeout) for u, h in zip(url_list, hdrs_list)]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(concurrency, len(url_list))) as pool:
        return list(
            pool.map(lambda t: fetch_one(t[0], transport, t[1], timeout), zip(url_list, hdrs_list))
        )


def live_fetch(
    urls: DataFrame,
    transport=None,
    url_col: str = "url_canon",
    timeout: float = DEFAULT_TIMEOUT,
    headers: dict | None = None,
    user_agent: str | None = None,
    accept_encoding: bool = True,
    etag_col: str | None = None,
    last_modified_col: str | None = None,
    concurrency: int = 1,
) -> DataFrame:
    """The fetch stage as mapInPandas: input rows pass through unchanged
    plus (final_url, html BINARY, status, fetch_error, etag,
    last_modified). Arrow-batched; one Python loop per batch over
    politeness-bounded rows (the fetch is network-bound — this is the
    stage where per-row Python is the design, not a smell). Pass
    ``transport=None`` for the stdlib HTTP transport.

    ``accept_encoding=True`` advertises the codings ``decode_content`` can
    undo (undici adds this header itself; a user-supplied Accept-Encoding
    wins). Name ``etag_col`` / ``last_modified_col`` to make the fetch
    CONDITIONAL: rows with a non-null stored validator send If-None-Match
    / If-Modified-Since, and an unchanged resource comes back as a 304
    status row with no body — revalidation at header cost instead of a
    refetch (RFC 9110 §13; pair with ``catalog``'s latest_capture or the
    downloaded page store for the cached bytes).

    ``concurrency>1`` overlaps requests inside each Arrow batch on a
    thread pool (``fetch_rows``): at ~200 ms/URL a politeness bucket of
    64 URLs serializes to ~13 s per task sequentially; with
    concurrency=16 the same bucket drains in ~1 s. Output rows are
    byte-identical to sequential (order-preserving assembly) — asserted
    by tests/test_live_fetch.py's concurrency differential."""
    tp = transport or urllib_transport
    hdrs = merge_headers(headers, user_agent)
    if accept_encoding:
        if not any(k.lower() == "accept-encoding" for k in hdrs):
            hdrs["Accept-Encoding"] = ACCEPT_ENCODING
    out_schema = StructType(list(urls.schema.fields) + FETCH_FIELDS)
    in_cols = [f.name for f in urls.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {name: [] for name in ("final_url", "html", "status", "fetch_error", "etag", "last_modified")}
            etags = pdf[etag_col] if etag_col else None
            lastmods = pdf[last_modified_col] if last_modified_col else None
            url_list, hdrs_list = [], []
            for i, u in enumerate(pdf[url_col]):
                row_hdrs = hdrs
                cond_etag = etags.iloc[i] if etags is not None else None
                cond_lm = lastmods.iloc[i] if lastmods is not None else None
                if (cond_etag is not None and not pd.isna(cond_etag)) or (
                    cond_lm is not None and not pd.isna(cond_lm)
                ):
                    row_hdrs = dict(hdrs)
                    if cond_etag is not None and not pd.isna(cond_etag):
                        row_hdrs["If-None-Match"] = str(cond_etag)
                    if cond_lm is not None and not pd.isna(cond_lm):
                        row_hdrs["If-Modified-Since"] = str(cond_lm)
                url_list.append(u)
                hdrs_list.append(row_hdrs)
            for f, b, s, e, tg, lm in fetch_rows(url_list, hdrs_list, tp, timeout, concurrency):
                cols["final_url"].append(f)
                cols["html"].append(b)
                cols["status"].append(s)
                cols["fetch_error"].append(e)
                cols["etag"].append(tg)
                cols["last_modified"].append(lm)
            out = pdf[in_cols].copy()
            for name in ("final_url", "html", "fetch_error", "etag", "last_modified"):
                out[name] = pd.Series(cols[name], index=pdf.index, dtype=object)
            out["status"] = pd.Series(cols["status"], index=pdf.index, dtype="int32")
            yield out

    return urls.mapInPandas(run, out_schema)
