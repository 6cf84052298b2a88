"""Deterministic synthetic Common-Crawl-style pages table + robots rules.

Generates the crawl input table mandated by BASELINE.json's input_hint —
``(url string, warc_ts timestamp, html binary, text string, lang string)`` —
as a pure function of the row id (no wall clock, no RNG state), so any two
runs (and any two parallelism levels) produce identical bytes.  Generation is
distributed: ``spark.range(n) → mapInPandas``, so the 100 TB-scale variant is
the same code with a bigger ``n``.

The page graph is a linked web with:
- Zipf-skewed host sizes (hot-host skew dial ``skew``) — exercises the
  salted-partitioning / politeness path,
- within-host relative links, cross-host absolute links, duplicate links,
  entity-encoded hrefs, ``..`` traversals, dead links (404s),
- WPDM ``/download/`` pages, CivicWeb preview pages, DocuShare pages that
  trigger the reference's detector chain,
- robots-disallowed subtrees on some hosts,
- near-duplicate page pairs (for minhash/simhash dedup testing).

``text`` is the byte-identical oracle column: it is computed with
``textops.strip_html_to_text`` at generation time, so the extraction stage
can be verified byte-for-byte at any scale.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from . import textops, urlops

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("disallow_prefixes", ArrayType(StringType()), False),
        StructField("crawl_delay_ms", IntegerType(), False),
    ]
)

_LANGS = ["en", "de", "es", "fr", "zh"]
_WORDS = (
    "harbor council agenda minutes budget zoning permit notice meeting public "
    "report plan district schedule committee review project water street park "
    "library safety transit housing survey update hearing board vote district"
).split()
_BASE_TS = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)

# mixing constants for the deterministic pseudo-graph
_MIX_A = 2654435761
_MIX_B = 104729


def host_layout(n_pages: int, n_hosts: int, skew: float) -> np.ndarray:
    """Start offset of each host's contiguous page-id range (Zipf sizes)."""
    w = 1.0 / np.arange(1, n_hosts + 1) ** skew
    w /= w.sum()
    sizes = np.maximum(1, np.floor(w * n_pages)).astype(np.int64)
    # fix rounding so sizes sum exactly to n_pages
    diff = n_pages - sizes.sum()
    sizes[0] += diff
    starts = np.zeros(n_hosts, dtype=np.int64)
    np.cumsum(sizes[:-1], out=starts[1:])
    return starts


def host_name(i: int) -> str:
    if i % 11 == 3:
        return f"board{i}.civicweb.net"
    if i % 11 == 7:
        return f"portal{i}.docushare.test"
    return f"site{i}.crawl.test"


def _words(seed: int, n: int) -> str:
    return " ".join(_WORDS[(seed * 31 + 7 * k) % len(_WORDS)] for k in range(n))


def _page_kind(host_idx: int, r: int) -> str:
    if host_idx % 11 == 3 and r % 5 == 2:
        return "civicweb"
    if host_idx % 11 == 7 and r % 4 == 1:
        return "docushare"
    if r % 13 == 6:
        return "wpdm"
    return "normal"


def page_url(host_idx: int, r: int, starts: np.ndarray) -> str:
    """Canonical URL of page r on host host_idx (what the frontier joins on)."""
    host = host_name(host_idx)
    kind = _page_kind(host_idx, r)
    if kind == "wpdm":
        return f"https://{host}/download/doc{r}/"  # canonical form has the trailing slash
    if kind == "civicweb":
        return f"https://{host}/filepro/documents/?preview={r}"
    if kind == "docushare":
        return f"https://{host}/docushare/dsweb/Get/Document-{r}"
    return f"https://{host}/page/{r}"


def _render_html(
    host_idx: int,
    r: int,
    starts: np.ndarray,
    n_hosts: int,
    host_size: int,
    body_words: int = 40,
    extra_links: int = 0,
) -> str:
    """``body_words``/``extra_links`` dial page richness: defaults give the
    compact pages the unit tests use; the bench passes Common-Crawl-like
    sizes (hundreds of words, tens of links) so parse compute per page is
    realistic."""
    host = host_name(host_idx)
    kind = _page_kind(host_idx, r)
    pid = int(starts[host_idx]) + r
    title = f"{kind.title()} {r} on {host}"
    near_dup = r % 17 == 5 and r > 0
    body_seed = pid - 1 if near_dup else pid
    body = _words(body_seed, body_words + (pid % 40))
    if near_dup:
        body += " variant"

    def normal_r(x: int) -> int:
        # nudge a page index off special slots so /page/{x} actually exists
        x %= max(host_size, 1)
        for _ in range(24):
            if _page_kind(host_idx, x) == "normal":
                return x
            x = (x + 1) % max(host_size, 1)
        return 0

    links = []
    deg = 3 + pid % 4 + extra_links
    for j in range(deg):
        child = normal_r(r * 7 + j * _MIX_B + 1)
        links.append((f"/page/{child}", f"page {child}"))
    # duplicate of the first link (keep-first dedupe exercise)
    if links:
        links.append((links[0][0], "duplicate"))
    # .. traversal resolving within host
    links.append((f"../page/{normal_r(r + 3)}", "up and over"))
    # cross-host absolute link
    other = (host_idx + 1 + pid % max(n_hosts - 1, 1)) % n_hosts
    links.append((f"https://{host_name(other)}/page/0", "partner site"))
    # entity-encoded query link (resolves to a 404 — no such page)
    links.append((f"/search?q={r}&amp;lang=en", "search"))
    # dead link
    if pid % 6 == 0:
        links.append((f"/missing/{pid}", "gone"))
    # robots-disallowed subtree on some hosts
    if host_idx % 7 == 3:
        links.append((f"/private/area{r % 9}", "internal"))
    # document file link
    if pid % 9 == 2:
        links.append((f"/files/report{r}.pdf", "report pdf"))
    # redirect-chain link (/chain/{t} → /redir/{t} → /page/{t})
    t_red = (r // 23) * 23 + 11
    if t_red < host_size and _page_kind(host_idx, t_red) == "normal":
        links.append((f"/chain/{t_red}", "via redirect"))
    # link to a VALID special page of this host so detectors get traffic
    if host_size > 4:
        if host_idx % 11 == 3:
            t = (r // 5) * 5 + 2
            t = t if t < host_size else 2
            links.append((f"/filepro/documents/?preview={t}", "preview"))
        elif host_idx % 11 == 7:
            t = (r // 4) * 4 + 1
            t = t if t < host_size else 1
            links.append((f"/docushare/dsweb/Get/Document-{t}", "document"))
        else:
            t = (r // 13) * 13 + 6
            t = t if t < host_size else 6
            if t < host_size:
                links.append((f"/download/doc{t}", "download page"))

    anchor_html = "\n    ".join(
        f'<a href="{href}" class="nav l{j % 3}">{text}</a>' for j, (href, text) in enumerate(links)
    )
    extra = ""
    if kind == "wpdm":
        extra = (
            '<div class="wpdm-download-link">'
            f'<a href="/files/doc{r}.pdf?wpdmdl={r}&amp;refresh=tok{pid % 97}">Download</a></div>'
        )
    elif kind == "civicweb":
        extra = f'<a href="/filepro/document/{r}/Meeting {r} - Agenda - Pdf.pdf">Open document</a>'
    elif kind == "docushare":
        extra = f'<a href="/dsweb/Get/Document-{r}/Record {r} Minutes.pdf">Fetch record</a>'

    return (
        "<html>\n"
        f"  <head>\n    <title>{title}</title>\n"
        f'    <meta name="description" content="{kind} page {r} of {host}">\n'
        "    <style>body { margin: 0; }</style>\n  </head>\n"
        "  <body>\n"
        f"    <script>var pid = {pid}; if (pid < 2) console.log('<b>x</b>');</script>\n"
        f"    <h1>{title}</h1>\n"
        f"    <p>{body}</p>\n"
        f"    {anchor_html}\n"
        f"    {extra}\n"
        "  </body>\n</html>\n"
    )


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int | None = None,
    skew: float = 1.2,
    body_words: int = 40,
    extra_links: int = 0,
) -> DataFrame:
    """Distributed deterministic pages table (url, warc_ts, html, text, lang)."""
    if n_hosts is None:
        n_hosts = max(4, int(n_pages**0.5) // 2)
    starts = host_layout(n_pages, n_hosts, skew)
    sizes = np.append(starts[1:], n_pages) - starts

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid in pdf["id"].to_numpy():
                host_idx = int(np.searchsorted(starts, pid, side="right") - 1)
                r = int(pid - starts[host_idx])
                host_size = int(sizes[host_idx])
                html = _render_html(
                    host_idx, r, starts, n_hosts, host_size, body_words, extra_links
                )
                rows.append(
                    {
                        "url": page_url(host_idx, r, starts),
                        "warc_ts": _BASE_TS + _dt.timedelta(seconds=int(pid) % 86400),
                        "html": html.encode("utf-8"),
                        "text": textops.strip_html_to_text(html),
                        "lang": _LANGS[(pid * _MIX_A) % len(_LANGS)],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])

    return spark.range(n_pages).mapInPandas(gen, PAGES_SCHEMA)


REDIRECTS_SCHEMA = StructType(
    [
        StructField("src", StringType(), False),
        StructField("location", StringType(), False),
        StructField("status", IntegerType(), False),
    ]
)


def generate_redirects(spark: SparkSession, n_pages: int, n_hosts: int | None = None, skew: float = 1.2) -> DataFrame:
    """Deterministic redirect table for the synthetic web:

    - ``/redir/{r}``  → 301 → ``/page/{r}``          (single hop)
    - ``/chain/{r}``  → 302 → ``/redir/{r}``         (two hops)
    - ``/loopA`` ⇄ ``/loopB`` on host 0              (infinite loop — must
      trip the ≤5-hop limit, simple.ts:94-102)
    """
    if n_hosts is None:
        n_hosts = max(4, int(n_pages**0.5) // 2)
    starts = host_layout(n_pages, n_hosts, skew)
    sizes = np.append(starts[1:], n_pages) - starts
    rows = []
    for i in range(n_hosts):
        host = host_name(i)
        size = int(sizes[i])
        for r in range(size):
            if r % 23 == 11 and _page_kind(i, r) == "normal":
                rows.append((f"https://{host}/redir/{r}", f"https://{host}/page/{r}", 301))
                rows.append((f"https://{host}/chain/{r}", f"https://{host}/redir/{r}", 302))
    h0 = host_name(0)
    rows.append((f"https://{h0}/loopA", f"https://{h0}/loopB", 302))
    rows.append((f"https://{h0}/loopB", f"https://{h0}/loopA", 302))
    return spark.createDataFrame(rows, REDIRECTS_SCHEMA)


def generate_robots(spark: SparkSession, n_hosts: int) -> DataFrame:
    """Robots rules: every 7th host (mod 3) disallows its /private/ subtree."""
    rows = []
    for i in range(n_hosts):
        prefixes = []
        if i % 7 == 3:
            prefixes.append("/private/")
        if i % 13 == 5:
            prefixes.append("/files/")
        rows.append((host_name(i), prefixes, 500 + (i % 5) * 250))
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def generate_robots_txt(spark: SparkSession, n_hosts: int) -> DataFrame:
    """Raw ``(host, robots_txt)`` bodies whose RFC 9309 parse (for UA ``*``)
    equals ``generate_robots``'s pre-parsed rules exactly — the ingestion
    path a real crawl uses. Bodies deliberately include comments, blank
    lines, case-mixed directives, and a more-specific ``greedybot`` group
    (ignored when parsing for ``*``) so the parser earns its keep."""
    rows = []
    for i in range(n_hosts):
        lines = ["# synthetic robots fixture", f"# host {i}", ""]
        lines += ["User-agent: greedybot", "Disallow: /", "Crawl-delay: 60", ""]
        lines += ["User-Agent: *"]
        if i % 7 == 3:
            lines.append("disallow: /private/")
        if i % 13 == 5:
            lines.append("Disallow: /files/  # keep binaries out")
        delay_s = (500 + (i % 5) * 250) / 1000
        lines.append(f"Crawl-delay: {delay_s}")
        rows.append((host_name(i), "\n".join(lines) + "\n"))
    schema = StructType(
        [StructField("host", StringType(), False), StructField("robots_txt", StringType(), False)]
    )
    return spark.createDataFrame(rows, schema)


def seed_urls(
    n_pages: int,
    n_hosts: int | None = None,
    skew: float = 1.2,
    k: int = 8,
    per_host: int = 1,
) -> list[str]:
    """Deterministic seed list: the first ``per_host`` pages of the ``k``
    largest hosts (``per_host > 1`` puts tick 0 at politeness steady state,
    which is what throughput benchmarks want)."""
    if n_hosts is None:
        n_hosts = max(4, int(n_pages**0.5) // 2)
    starts = host_layout(n_pages, n_hosts, skew)
    sizes = np.append(starts[1:], n_pages) - starts
    return [
        page_url(i, r, starts)
        for i in range(min(k, n_hosts))
        for r in range(min(per_host, int(sizes[i])))
    ]
