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
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def parse_warc(data: bytes) -> Iterator[tuple[str, _dt.datetime, bytes]]:
    """Yield (url, warc_ts, html_bytes) from WARC bytes (plain or gzipped,
    including per-record gzip members). Non-``response`` records
    (warcinfo, request, metadata) are skipped. Framing is strictly by
    Content-Length — record payloads are never scanned for delimiters, so
    binary bodies containing ``WARC/1.0`` can't desync the parser."""
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
            # a corrupt Content-Length makes the rest of the file
            # unframeable — stop parsing this file (yielding what we have)
            # instead of raising and killing the whole ingestion task
            break
        payload = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = _parse_warc_date(headers.get("warc-date", "1970-01-01T00:00:00Z"))
        http_end = payload.find(_CRLF + _CRLF)
        html = payload[http_end + 4 :] if http_end >= 0 else payload
        yield url, ts, html


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
