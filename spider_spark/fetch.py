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

MAX_REDIRECTS = 5  # simple.ts:100 / frontier.MAX_REDIRECTS — one rule
DEFAULT_TIMEOUT = 30.0  # types.ts:127 (ms in the reference; seconds here)

_REDIRECT_STATUSES = frozenset({301, 302, 303, 307, 308})

FETCH_FIELDS = [
    StructField("final_url", StringType(), True),
    StructField("html", BinaryType(), True),
    StructField("status", IntegerType(), True),
    StructField("fetch_error", StringType(), True),
]


def merge_headers(headers: dict | None, user_agent: str | None = None) -> dict:
    """loadEnvConfig + header merge (simple.ts:36-43,64-75): defaults,
    userAgent override slot, then user headers win key-by-key."""
    out = dict(DEFAULT_HEADERS)
    if user_agent:
        out["User-Agent"] = user_agent
    out.update(headers or {})
    return out


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


def make_table_transport(pages: dict[str, bytes], redirects: dict[str, str] | None = None):
    """Offline fake transport from lookup tables — the unit-test and
    differential-test seam. Known URLs → (200, html bytes); redirect
    sources → (301, Location); everything else → (404, b'')."""
    redirects = dict(redirects or {})
    pages = dict(pages)

    def transport(url: str, headers: dict, timeout: float):
        if url in redirects:
            return 301, {"Location": redirects[url]}, b""
        if url in pages:
            body = pages[url]
            if isinstance(body, str):
                body = body.encode("utf-8")
            return 200, {"Content-Type": "text/html"}, body
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
    Returns (final_url, html_bytes | None, status, error | None)."""
    current = url
    try:
        for _hop in range(MAX_REDIRECTS + 1):
            status, resp_headers, body = transport(current, headers, timeout)
            if status in _REDIRECT_STATUSES:
                loc = None
                for k, v in (resp_headers or {}).items():
                    if k.lower() == "location":
                        loc = v
                        break
                if loc is None:
                    # a redirect status with no Location is a dead hop
                    return current, None, int(status), "redirect without Location"
                if _hop == MAX_REDIRECTS:
                    # still redirecting after the limit → 599, like
                    # frontier.resolve_redirects (strict divergence)
                    return current, None, 599, "too many redirects"
                current = _resolve_location(current, loc)
                continue
            if status >= 400:
                # NetworkError → status row (simple.ts:104-109 made row-wise)
                return current, None, int(status), f"HTTP {status}"
            return current, bytes(body) if body is not None else None, int(status), None
    except Exception as e:  # timeout / refused / DNS — undici throw path
        return current, None, 599, f"{type(e).__name__}: {e}"
    return current, None, 599, "unreachable"


def live_fetch(
    urls: DataFrame,
    transport=None,
    url_col: str = "url_canon",
    timeout: float = DEFAULT_TIMEOUT,
    headers: dict | None = None,
    user_agent: str | None = None,
) -> DataFrame:
    """The fetch stage as mapInPandas: input rows pass through unchanged
    plus (final_url, html BINARY, status, fetch_error). Arrow-batched; one
    Python loop per batch over politeness-bounded rows (the fetch is
    network-bound — this is the stage where per-row Python is the design,
    not a smell). Pass ``transport=None`` for the stdlib HTTP transport."""
    tp = transport or urllib_transport
    hdrs = merge_headers(headers, user_agent)
    out_schema = StructType(list(urls.schema.fields) + FETCH_FIELDS)
    in_cols = [f.name for f in urls.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            finals, bodies, statuses, errors = [], [], [], []
            for u in pdf[url_col]:
                f, b, s, e = fetch_one(u, tp, hdrs, timeout)
                finals.append(f)
                bodies.append(b)
                statuses.append(s)
                errors.append(e)
            out = pdf[in_cols].copy()
            out["final_url"] = pd.Series(finals, index=pdf.index, dtype=object)
            out["html"] = pd.Series(bodies, index=pdf.index, dtype=object)
            out["status"] = pd.Series(statuses, index=pdf.index, dtype="int32")
            out["fetch_error"] = pd.Series(errors, index=pdf.index, dtype=object)
            yield out

    return urls.mapInPandas(run, out_schema)
