"""WARC ingestion: Common Crawl's archival format as a first-class source.

The reference fetches live pages (src/adapters/simple.ts:34-154); this
engine's corpus is a Common-Crawl-style pages table (url, warc_ts,
html BINARY, text, lang), and WARC (ISO 28500) is the public interchange
format for exactly those pages — a Common Crawl segment ingested here
becomes the synthetic "network" the crawl tick joins against.

Physical shape for 100 TB:
- ``spark.read.format("binaryFile")`` yields one row per WARC file; a
  ``mapInPandas`` flat-map parses each file's records into page rows, so
  parallelism = number of segment files (Common Crawl ships ~64k segments
  per snapshot — plenty of tasks) and no record ever crosses Python
  row-at-a-time.
- Parsing is bytes-level scanning framed by Content-Length (never regex
  over the whole file); gzip members are decompressed streamwise
  (Common Crawl gzips each record as its own member — stdlib gzip
  decompresses concatenated members in one pass).
- Writing is for tests/fixtures only (deterministic bytes: fixed gzip
  mtime, record ids derived from the URL hash).
"""

from __future__ import annotations

import datetime as _dt
import gzip
import hashlib
import io
import json as _json
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .synth import PAGES_SCHEMA

_CRLF = b"\r\n"


def _warc_date(ts: _dt.datetime) -> str:
    # WARC 1.1 allows fractional seconds; emit them when present so the
    # roundtrip is fidelity-preserving for sub-second timestamps
    if ts.microsecond:
        return ts.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_warc_date(value: str) -> _dt.datetime:
    # accept second and fractional-second forms (warcio/wget/Heritrix all
    # emit fractional); unparseable dates degrade to epoch rather than
    # killing the ingestion task for the whole file
    try:
        return _dt.datetime.fromisoformat(value.rstrip("Z"))
    except ValueError:
        return _dt.datetime(1970, 1, 1)


def build_record(url: str, warc_ts: _dt.datetime, html: bytes, status: int = 200) -> bytes:
    """One WARC/1.0 ``response`` record wrapping an HTTP/1.1 response.
    Deterministic: the record id is derived from the URL, no wall clock."""
    rid = hashlib.md5(url.encode("utf-8")).hexdigest()
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: text/html; charset=utf-8\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode("ascii") + html
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Record-ID: <urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}-{rid[16:20]}-{rid[20:32]}>\r\n".encode("ascii")
        + f"WARC-Date: {_warc_date(warc_ts)}\r\n".encode("ascii")
        + f"WARC-Target-URI: {url}\r\n".encode("ascii")
        + b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n".encode("ascii")
    )
    return headers + _CRLF + http + _CRLF + _CRLF


def build_warc(records: list[tuple[str, _dt.datetime, bytes]], compress: bool = False) -> bytes:
    """Concatenate records into one WARC blob; ``compress=True`` gzips each
    record as its own member (the Common Crawl layout) with mtime pinned to
    0 so identical input yields identical bytes."""
    out = io.BytesIO()
    for url, ts, html in records:
        rec = build_record(url, ts, html)
        if compress:
            with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
                gz.write(rec)
        else:
            out.write(rec)
    return out.getvalue()


def _iter_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Walk WARC bytes (plain or gzipped) record by record, yielding
    (lowercased header dict, payload bytes). Framing is strictly by
    Content-Length — record payloads are never scanned for delimiters, so
    binary bodies containing ``WARC/1.0`` can't desync the parser. A
    corrupt Content-Length makes the rest of the file unframeable — stop
    (yielding what we have) instead of raising and killing the whole
    ingestion task."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        header_block = data[pos:head_end].decode("utf-8", "replace")
        headers: dict[str, str] = {}
        for line in header_block.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            break
        payload = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        yield headers, payload


def _http_body(payload: bytes) -> bytes:
    http_end = payload.find(_CRLF + _CRLF)
    return payload[http_end + 4 :] if http_end >= 0 else payload


def parse_warc(data: bytes) -> Iterator[tuple[str, _dt.datetime, bytes]]:
    """Yield (url, warc_ts, html_bytes) from WARC bytes (plain or gzipped,
    including per-record gzip members). Non-``response`` records
    (warcinfo, request, revisit, metadata) are skipped."""
    for headers, payload in _iter_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = _parse_warc_date(headers.get("warc-date", "1970-01-01T00:00:00Z"))
        yield url, ts, _http_body(payload)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files → pages-table DataFrame (PAGES_SCHEMA shape; ``text`` and
    ``lang`` empty — downstream extraction owns them). One task per file."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PAGES_SCHEMA.fields]
        for pdf in batches:
            rows = [
                {"url": u, "warc_ts": ts, "html": html, "text": "", "lang": ""}
                for blob in pdf["content"]
                for u, ts, html in parse_warc(bytes(blob))
            ]
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse_files, PAGES_SCHEMA)


def roundtrip_pages(pages: DataFrame, compress: bool = False) -> DataFrame:
    """Serialize pages → WARC bytes → parse back, entirely inside executors
    (one WARC blob per Arrow batch; no driver collect, no filesystem).
    Exercises the full serialize/parse path distributed — the test/oracle
    surface for the parser; ingestion of real files goes through
    ``read_warc``."""
    import pandas as pd

    def rt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PAGES_SCHEMA.fields]
        for pdf in batches:
            recs = [
                (r.url, r.warc_ts.to_pydatetime(), bytes(r.html))
                for r in pdf.itertuples(index=False)
            ]
            blob = build_warc(recs, compress=compress)
            rows = [
                {"url": u, "warc_ts": ts, "html": html, "text": "", "lang": ""}
                for u, ts, html in parse_warc(blob)
            ]
            yield pd.DataFrame(rows, columns=cols)

    return (
        pages.select("url", "warc_ts", "html")
        .withColumn("text", F.lit(""))
        .withColumn("lang", F.lit(""))
        .mapInPandas(rt, PAGES_SCHEMA)
    )


# --- Revisit records (WARC 1.1 §6.7.2): the archive-side dedup --------------
# A real crawl refetches unchanged pages constantly; web archives store the
# payload ONCE and write a bodiless `revisit` record for every later
# identical capture, pointing back at the stored one. At 100 TB this is the
# difference between an archive that grows with crawl frequency and one
# that grows with actual change.

REVISIT_PROFILE = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"

_REVISIT_FIELDS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("kind", StringType(), False),  # response | revisit
        StructField("html", BinaryType(), True),  # null on revisit rows
        StructField("digest", StringType(), False),
        StructField("refers_to_url", StringType(), True),
        StructField("refers_to_ts", TimestampType(), True),
    ]
)


def payload_digest(html: bytes) -> str:
    """WARC-Payload-Digest value: labelled sha256 hex (matches the CDX
    index's digest column byte-for-byte after the label strip)."""
    return "sha256:" + hashlib.sha256(html).hexdigest()


def build_revisit_record(
    url: str,
    warc_ts: _dt.datetime,
    digest: str,
    refers_to_url: str,
    refers_to_ts: _dt.datetime,
    status: int = 200,
) -> bytes:
    """One WARC ``revisit`` record under the identical-payload-digest
    profile: HTTP response headers only, NO body — the payload lives in
    the referred-to ``response`` record. Deterministic like
    ``build_record`` (record id from the URL+date, no wall clock)."""
    rid = hashlib.md5(f"{url}@{_warc_date(warc_ts)}".encode("utf-8")).hexdigest()
    http = (
        f"HTTP/1.1 {status} OK\r\n" f"Content-Type: text/html; charset=utf-8\r\n\r\n"
    ).encode("ascii")
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: revisit\r\n"
        + f"WARC-Profile: {REVISIT_PROFILE}\r\n".encode("ascii")
        + f"WARC-Record-ID: <urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}-{rid[16:20]}-{rid[20:32]}>\r\n".encode("ascii")
        + f"WARC-Date: {_warc_date(warc_ts)}\r\n".encode("ascii")
        + f"WARC-Target-URI: {url}\r\n".encode("ascii")
        + f"WARC-Payload-Digest: {digest}\r\n".encode("ascii")
        + f"WARC-Refers-To-Target-URI: {refers_to_url}\r\n".encode("ascii")
        + f"WARC-Refers-To-Date: {_warc_date(refers_to_ts)}\r\n".encode("ascii")
        + b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n".encode("ascii")
    )
    return headers + _CRLF + http + _CRLF + _CRLF


def build_archive(rows: list[dict], compress: bool = False) -> bytes:
    """Rows from a :func:`revisit_plan` (dicts with url/warc_ts/kind/html/
    digest/refers_to_url/refers_to_ts) → one WARC blob mixing ``response``
    and ``revisit`` records. Deterministic for fixtures, like
    ``build_warc``."""
    out = io.BytesIO()
    for r in rows:
        if r["kind"] == "revisit":
            rec = build_revisit_record(
                r["url"], r["warc_ts"], r["digest"], r["refers_to_url"], r["refers_to_ts"]
            )
        else:
            rec = build_record(r["url"], r["warc_ts"], r["html"])
        if compress:
            with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
                gz.write(rec)
        else:
            out.write(rec)
    return out.getvalue()


def parse_archive(data: bytes) -> Iterator[dict]:
    """Yield response AND revisit records as dicts shaped like
    ``_REVISIT_FIELDS`` rows. Response records get their digest computed
    (so hydration joins never trust a possibly-absent header); revisit
    records surface their stored WARC-Payload-Digest and Refers-To
    pointers with a null body."""
    for headers, payload in _iter_records(data):
        kind = headers.get("warc-type")
        if kind not in ("response", "revisit"):
            continue
        url = headers.get("warc-target-uri", "")
        ts = _parse_warc_date(headers.get("warc-date", "1970-01-01T00:00:00Z"))
        if kind == "response":
            body = _http_body(payload)
            yield {
                "url": url,
                "warc_ts": ts,
                "kind": "response",
                "html": body,
                "digest": payload_digest(body),
                "refers_to_url": None,
                "refers_to_ts": None,
            }
        else:
            yield {
                "url": url,
                "warc_ts": ts,
                "kind": "revisit",
                "html": None,
                "digest": headers.get("warc-payload-digest", ""),
                "refers_to_url": headers.get("warc-refers-to-target-uri"),
                "refers_to_ts": _parse_warc_date(
                    headers.get("warc-refers-to-date", "1970-01-01T00:00:00Z")
                ),
            }


def revisit_plan(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts", html_col: str = "html"
) -> DataFrame:
    """Decide, per capture, whether to store the payload or a revisit
    pointer: the FIRST capture of each distinct payload (by timestamp,
    URL tiebreak — deterministic under any partitioning) becomes the
    stored ``response``; every later identical capture becomes a
    ``revisit`` referring to it. Output: ``_REVISIT_FIELDS`` shape.

    Scale shape: one partial-aggregable groupBy on the digest (min_by of
    a (ts, url) struct — never a per-digest window sort), then one
    equi-join of captures back to their group's winner. Payload bytes
    hash once in projection; the digest shuffle carries
    (digest, ts, url) — never the bodies twice."""
    d = F.concat(F.lit("sha256:"), F.sha2(F.col(html_col), 256))
    caps = pages.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts"),
        F.col(html_col).alias("html"),
        d.alias("digest"),
    )
    first = (
        caps.groupBy("digest")
        .agg(F.min(F.struct("warc_ts", "url")).alias("_w"))
        .select("digest", F.col("_w.url").alias("_furl"), F.col("_w.warc_ts").alias("_fts"))
    )
    out = caps.join(first, "digest").select(
        "url",
        "warc_ts",
        F.when(
            (F.col("url") == F.col("_furl")) & (F.col("warc_ts") == F.col("_fts")),
            F.lit("response"),
        )
        .otherwise(F.lit("revisit"))
        .alias("kind"),
        F.col("html"),
        "digest",
        "_furl",
        "_fts",
    )
    return out.select(
        "url",
        "warc_ts",
        "kind",
        F.when(F.col("kind") == "response", F.col("html")).alias("html"),
        "digest",
        F.when(F.col("kind") == "revisit", F.col("_furl")).alias("refers_to_url"),
        F.when(F.col("kind") == "revisit", F.col("_fts")).alias("refers_to_ts"),
    )


def hydrate_revisits(records: DataFrame) -> DataFrame:
    """Inverse of :func:`revisit_plan`: restore full (url, warc_ts, html)
    captures from a mixed response/revisit record table. Revisit rows
    equi-join to their stored response on (refers_to_url, refers_to_ts)
    — the WARC 1.1 resolution rule — and take its body; an orphaned
    revisit (its response record lost) keeps a NULL body rather than
    vanishing, so archive damage is visible, not silent. One equi-join,
    bodies shuffle once (only the stored side carries them)."""
    resp = records.filter(F.col("kind") == "response").select(
        F.col("url").alias("refers_to_url"),
        F.col("warc_ts").alias("refers_to_ts"),
        F.col("html").alias("_stored"),
    )
    rev = (
        records.filter(F.col("kind") == "revisit")
        .join(resp, ["refers_to_url", "refers_to_ts"], "left")
        .select("url", "warc_ts", F.col("_stored").alias("html"))
    )
    return records.filter(F.col("kind") == "response").select(
        "url", "warc_ts", "html"
    ).unionByName(rev)


def archive_roundtrip(pages: DataFrame, compress: bool = False) -> DataFrame:
    """revisit_plan → serialize (one blob per Arrow batch) → parse_archive,
    entirely inside executors — the distributed test surface for the
    revisit write/read path, like ``roundtrip_pages`` for plain WARC.
    Feed the result to :func:`hydrate_revisits` to recover full pages."""
    import pandas as pd

    plan = revisit_plan(pages)

    def rt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in _REVISIT_FIELDS.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rows.append(
                    {
                        "url": r.url,
                        "warc_ts": r.warc_ts.to_pydatetime(),
                        "kind": r.kind,
                        "html": bytes(r.html) if r.html is not None else None,
                        "digest": r.digest,
                        "refers_to_url": r.refers_to_url,
                        "refers_to_ts": r.refers_to_ts.to_pydatetime()
                        if r.refers_to_ts is not None and not pd.isna(r.refers_to_ts)
                        else None,
                    }
                )
            blob = build_archive(rows, compress=compress)
            yield pd.DataFrame(list(parse_archive(blob)), columns=cols)

    return plan.mapInPandas(rt, _REVISIT_FIELDS)


# --- CDX-style archive index (the companion artifact to WARC: web archives
# ship a sorted URL index so lookups don't scan segments) --------------------


def col_surt(url):
    """SURT (Sort-friendly URI Reordering Transform, the Heritrix/CDX key):
    host labels reversed and comma-joined, then ``)`` + path + sorted query
    — e.g. ``https://www.example.com/a/b?b=2&a=1`` →
    ``com,example,www)/a/b?a=1&b=2``. Query params are sorted (CDX
    canonicalization) so equivalent URLs collate together. Pure Catalyst;
    expects a canonical URL (lowercase host), like everything downstream of
    ``udfs.canon_and_host``."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.parse_url(u, F.lit("HOST"))
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    query = F.parse_url(u, F.lit("QUERY"))
    qsorted = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when((query.isNotNull()) & (query != ""), F.concat(F.lit("?"), qsorted)).otherwise(
            F.lit("")
        ),
    )


def cdx_index(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts", html_col: str = "html"
) -> DataFrame:
    """Pages → CDX-style index rows ``(surt, cdx_ts 14-digit, url, digest
    sha256-hex)`` sorted by (surt, cdx_ts) — the archive lookup key order.
    The sort is a range partition by surt: at 100 TB each output file holds
    a contiguous SURT range, so a URL lookup touches one file (plus the
    sorted-file min/max pruning parquet gives for free)."""
    return (
        pages.select(
            col_surt(url_col).alias("surt"),
            F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("cdx_ts"),
            F.col(url_col).alias("url"),
            F.sha2(F.col(html_col), 256).alias("digest"),
        )
        .orderBy("surt", "cdx_ts")
    )


#: measured gate for broadcasting the lookup side of cdx_lookup — the same
#: limit-bounded-count discipline as Crawler.redirect_broadcast_rows
CDX_QUERY_BROADCAST_ROWS = 100_000


def cdx_lookup(
    index: DataFrame,
    prefixes: DataFrame,
    prefix_col: str = "prefix",
    latest_only: bool = False,
    broadcast: bool | None = None,
) -> DataFrame:
    """Archive lookup over a :func:`cdx_index` table: for each SURT prefix,
    every capture whose ``surt`` starts with it —
    ``(prefix, surt, cdx_ts, url, digest)``.

    Scale shape: a naive ``startswith`` join is a nested loop over the
    whole archive. Instead both sides derive the SURT HOST KEY (everything
    before ``)``) and EQUI-join on it — the index shuffles on host hash
    (or the query side broadcasts under a measured ``limit(N+1).count()``
    gate), and the prefix test runs as a post-join codegen filter within
    the matched host. This is the CDX-server key convention: exact-URL and
    path-prefix queries (``com,example,www)/docs/…``) share the host key,
    so each prefix MUST include the full host part up to ``)``.
    Domain-level queries (``matchType=domain``) key differently — run them
    as a ``startswith`` filter scan instead, where parquet min/max pruning
    over the (surt-sorted) index files bounds the read.

    ``latest_only=True`` keeps only the newest capture per (prefix, surt)
    — one partial-agg ``max_by``, the CDX ``limit=1 sort=reverse`` idiom.
    """
    q = prefixes.select(F.col(prefix_col).alias("prefix"))
    if broadcast is None:
        broadcast = (
            q.limit(CDX_QUERY_BROADCAST_ROWS + 1).count() <= CDX_QUERY_BROADCAST_ROWS
        )
    qk = q.withColumn("_hk", F.substring_index("prefix", ")", 1))
    qk = F.broadcast(qk) if broadcast else qk
    ik = index.withColumn("_hk", F.substring_index("surt", ")", 1))
    hits = (
        ik.join(qk, "_hk")
        .filter(F.col("surt").startswith(F.col("prefix")))
        .select("prefix", "surt", "cdx_ts", "url", "digest")
    )
    if not latest_only:
        return hits
    latest = (
        hits.groupBy("prefix", "surt")
        .agg(F.max_by(F.struct("cdx_ts", "url", "digest"), "cdx_ts").alias("_m"))
        .select("prefix", "surt", "_m.cdx_ts", "_m.url", "_m.digest")
    )
    return latest


# --- WET (extracted-text conversion records): the third Common Crawl
# artifact next to WARC and CDX — one text/plain `conversion` record per
# page, referencing the response record it was derived from ----------------


def build_wet_record(url: str, warc_ts: _dt.datetime, text: str) -> bytes:
    """One WARC/1.0 ``conversion`` record carrying extracted plain text.
    Deterministic like :func:`build_record` (ids from the URL hash);
    WARC-Refers-To points at the response record :func:`build_record`
    would emit for the same URL."""
    rid = hashlib.md5(("wet:" + url).encode("utf-8")).hexdigest()
    ref = hashlib.md5(url.encode("utf-8")).hexdigest()
    payload = text.encode("utf-8")

    def _uuid(h: str) -> str:
        return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"

    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        + f"WARC-Record-ID: {_uuid(rid)}\r\n".encode("ascii")
        + f"WARC-Refers-To: {_uuid(ref)}\r\n".encode("ascii")
        + f"WARC-Date: {_warc_date(warc_ts)}\r\n".encode("ascii")
        + f"WARC-Target-URI: {url}\r\n".encode("ascii")
        + b"Content-Type: text/plain\r\n"
        + f"Content-Length: {len(payload)}\r\n".encode("ascii")
    )
    return headers + _CRLF + payload + _CRLF + _CRLF


def build_wet(records: list[tuple[str, _dt.datetime, str]], compress: bool = False) -> bytes:
    """Concatenate conversion records into one WET blob (per-record gzip
    members when ``compress``, the Common Crawl layout, mtime pinned)."""
    out = io.BytesIO()
    for url, ts, text in records:
        rec = build_wet_record(url, ts, text)
        if compress:
            with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
                gz.write(rec)
        else:
            out.write(rec)
    return out.getvalue()


def parse_wet(data: bytes) -> Iterator[tuple[str, _dt.datetime, str]]:
    """Yield (url, warc_ts, text) from WET bytes. Same strict
    Content-Length framing as :func:`parse_warc`; only ``conversion``
    records are yielded, so a combined WARC+WET stream reads correctly."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    pos, n = 0, len(data)
    while pos < n:
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        header_block = data[pos:head_end].decode("utf-8", "replace")
        headers: dict[str, str] = {}
        for line in header_block.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            break
        payload = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "conversion":
            continue
        url = headers.get("warc-target-uri", "")
        ts = _parse_warc_date(headers.get("warc-date", "1970-01-01T00:00:00Z"))
        yield url, ts, payload.decode("utf-8", "replace")


WET_SCHEMA = "url string, warc_ts timestamp, text string"


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET files → (url, warc_ts, text) DataFrame. One task per file, like
    :func:`read_warc`."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"url": u, "warc_ts": ts, "text": txt}
                for blob in pdf["content"]
                for u, ts, txt in parse_wet(bytes(blob))
            ]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "text"])

    return files.mapInPandas(parse_files, WET_SCHEMA)


def wet_roundtrip(pages: DataFrame, compress: bool = False) -> DataFrame:
    """(url, warc_ts, text) → WET bytes → parsed back, entirely inside
    executors (the :func:`roundtrip_pages` discipline) — the test/oracle
    surface proving conversion-record framing is fidelity-preserving for
    arbitrary text, including text containing ``WARC/1.0`` and CRLFs."""
    import pandas as pd

    def rt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [
                (r.url, r.warc_ts.to_pydatetime(), r.text)
                for r in pdf.itertuples(index=False)
            ]
            blob = build_wet(recs, compress=compress)
            rows = [
                {"url": u, "warc_ts": ts, "text": txt} for u, ts, txt in parse_wet(blob)
            ]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "text"])

    return pages.select("url", "warc_ts", "text").mapInPandas(rt, WET_SCHEMA)


# --- WAT (metadata records, JSON payloads): the third Common Crawl
# artifact next to WARC and WET — one `metadata` record per page whose
# payload is the JSON envelope carrying extracted HTTP/HTML metadata
# (title + outlinks), the input most link-graph pipelines consume --------


def build_wat_record(
    url: str, warc_ts: _dt.datetime, title: str | None, links: list[str]
) -> bytes:
    """One WARC/1.0 ``metadata`` record whose payload is the Common Crawl
    WAT JSON envelope (the iipc/webarchive-commons layout): ``Envelope``
    → ``WARC-Header-Metadata`` (the originating response's WARC headers)
    + ``Payload-Metadata`` → ``HTTP-Response-Metadata`` →
    ``HTML-Metadata`` with ``Head.Title`` and the ``Links`` array of
    ``{"path": "A@/href", "url": ...}`` objects. JSON is serialized with
    sorted keys + compact separators so records are byte-deterministic
    (same discipline as :func:`build_record`'s md5-derived ids);
    WARC-Refers-To points at the response record for the same URL."""
    rid = hashlib.md5(("wat:" + url).encode("utf-8")).hexdigest()
    ref = hashlib.md5(url.encode("utf-8")).hexdigest()
    html_meta: dict = {
        "Links": [{"path": "A@/href", "url": u} for u in links],
    }
    if title is not None:
        html_meta["Head"] = {"Title": title}
    envelope = {
        "Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Date": _warc_date(warc_ts),
                "WARC-Target-URI": url,
                "WARC-Type": "response",
            },
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {"HTML-Metadata": html_meta},
            },
        }
    }
    payload = _json.dumps(
        envelope, sort_keys=True, separators=(",", ":"), ensure_ascii=False
    ).encode("utf-8")

    def _uuid(h: str) -> str:
        return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"

    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        + f"WARC-Record-ID: {_uuid(rid)}\r\n".encode("ascii")
        + f"WARC-Refers-To: {_uuid(ref)}\r\n".encode("ascii")
        + f"WARC-Date: {_warc_date(warc_ts)}\r\n".encode("ascii")
        + f"WARC-Target-URI: {url}\r\n".encode("ascii")
        + b"Content-Type: application/json\r\n"
        + f"Content-Length: {len(payload)}\r\n".encode("ascii")
    )
    return headers + _CRLF + payload + _CRLF + _CRLF


def build_wat(
    records: list[tuple[str, _dt.datetime, str | None, list[str]]],
    compress: bool = False,
) -> bytes:
    """Concatenate metadata records into one WAT blob (per-record gzip
    members when ``compress``, the Common Crawl layout, mtime pinned)."""
    out = io.BytesIO()
    for url, ts, title, links in records:
        rec = build_wat_record(url, ts, title, links)
        if compress:
            with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
                gz.write(rec)
        else:
            out.write(rec)
    return out.getvalue()


def parse_wat(
    data: bytes,
) -> Iterator[tuple[str, _dt.datetime, str | None, list[str]]]:
    """Yield (url, warc_ts, title, links) from WAT bytes. Same strict
    Content-Length framing as :func:`parse_warc` — the JSON payload is
    never scanned for delimiters, so titles/URLs containing ``WARC/1.0``
    or CRLFs cannot desync the stream. Only ``metadata`` records with a
    JSON payload are yielded, so a combined WARC+WET+WAT stream reads
    correctly. Unparseable JSON skips the record (never aborts the file)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    pos, n = 0, len(data)
    while pos < n:
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        header_block = data[pos:head_end].decode("utf-8", "replace")
        headers: dict[str, str] = {}
        for line in header_block.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            break
        payload = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "metadata":
            continue
        try:
            env = _json.loads(payload.decode("utf-8", "replace"))["Envelope"]
        except (ValueError, KeyError, TypeError):
            continue
        wh = env.get("WARC-Header-Metadata", {})
        url = wh.get("WARC-Target-URI", headers.get("warc-target-uri", ""))
        ts = _parse_warc_date(
            wh.get("WARC-Date", headers.get("warc-date", "1970-01-01T00:00:00Z"))
        )
        hm = (
            env.get("Payload-Metadata", {})
            .get("HTTP-Response-Metadata", {})
            .get("HTML-Metadata", {})
        )
        title = hm.get("Head", {}).get("Title")
        links = [
            d["url"]
            for d in hm.get("Links", [])
            if isinstance(d, dict) and "url" in d
        ]
        yield url, ts, title, links


WAT_SCHEMA = "url string, warc_ts timestamp, title string, links array<string>"


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """WAT files → (url, warc_ts, title, links) DataFrame. One task per
    file via binaryFile → mapInPandas, like :func:`read_warc` —
    at 100 TB the scan parallelism is the file count, which is how
    Common Crawl ships WAT (one ~1 GB gz per WARC)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"url": u, "warc_ts": ts, "title": t, "links": ls}
                for blob in pdf["content"]
                for u, ts, t, ls in parse_wat(bytes(blob))
            ]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "title", "links"])

    return files.mapInPandas(parse_files, WAT_SCHEMA)


def wat_roundtrip(pages: DataFrame, compress: bool = False) -> DataFrame:
    """(url, warc_ts, title, links) → WAT bytes → parsed back, entirely
    inside executors (the :func:`roundtrip_pages` discipline) — proves
    metadata-record framing + JSON escaping are fidelity-preserving for
    hostile titles (CRLFs, 'WARC/1.0' lines, quotes, non-ASCII)."""
    import pandas as pd

    def rt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [
                (
                    r.url,
                    r.warc_ts.to_pydatetime(),
                    r.title,
                    list(r.links) if r.links is not None else [],
                )
                for r in pdf.itertuples(index=False)
            ]
            blob = build_wat(recs, compress=compress)
            rows = [
                {"url": u, "warc_ts": ts, "title": t, "links": ls}
                for u, ts, t, ls in parse_wat(blob)
            ]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "title", "links"])

    return pages.select("url", "warc_ts", "title", "links").mapInPandas(rt, WAT_SCHEMA)


def wat_from_html(pages: DataFrame, compress: bool = False) -> DataFrame:
    """The WARC→WAT derivation Common Crawl runs: (url, warc_ts, html
    STRING) pages → WAT metadata records built with the ENGINE'S OWN
    reference-parity extractors (textops.extract_html_metadata for the
    title, textops.extract_html_links for document-order keep-first
    outlinks resolved WHATWG-style against the page URL) → parsed back to
    (url, warc_ts, title, links). One Arrow-batched mapInPandas
    projection, no shuffle; serialize→parse happens inside the executor
    so the record framing is exercised on every row, not just in tests.

    Scale shape (100 TB): map-only over the page store — the natural
    companion job to the per-tick parse projection; output is the input
    to every link-graph operator in operators/graph.py."""
    import pandas as pd

    from . import textops

    def derive(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for r in pdf.itertuples(index=False):
                html = r.html if isinstance(r.html, str) else ""
                title = textops.extract_html_metadata(html)["title"]
                links = [ln.href for ln in textops.extract_html_links(html, r.url)]
                recs.append((r.url, r.warc_ts.to_pydatetime(), title, links))
            blob = build_wat(recs, compress=compress)
            rows = [
                {"url": u, "warc_ts": ts, "title": t, "links": ls}
                for u, ts, t, ls in parse_wat(blob)
            ]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "title", "links"])

    return pages.select("url", "warc_ts", "html").mapInPandas(derive, WAT_SCHEMA)
