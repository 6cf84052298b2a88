"""Charset sniffing + decoding for fetched ``html: binary`` payloads.

The input contract (BASELINE.json input_hint) carries raw page bytes; real
web text is ~95% UTF-8 but the long tail (legacy windows-1252, UTF-16-BOM
exports, CJK encodings) silently mojibakes a corpus if decoded blind. This
module implements a simplified, documented subset of the WHATWG Encoding
sniffing algorithm (https://html.spec.whatwg.org/multipage/parsing.html
#determining-the-character-encoding), precedence:

1. **BOM** (UTF-8 / UTF-16LE / UTF-16BE) — always wins, per spec step 1.
2. ``charset=`` parameter of the Content-Type header, when given.
3. ``<meta charset=...>`` / ``<meta http-equiv="content-type" ...>``
   declaration, scanned in the first ``SNIFF_WINDOW`` bytes (spec
   prescan, ASCII-compatible scan).
4. Fallback ``windows-1252`` (the WHATWG default for unlabeled legacy
   content; every byte decodes, so the fallback is total).

Labels normalize through a WHATWG-alias subset (`_LABEL_ALIASES`) —
notably ``latin1``/``iso-8859-1``/``ascii`` are windows-1252 per spec.
Unknown labels fall through to the next precedence level rather than
erroring (a crawler must never fail a task on a bad header). Decode uses
``errors="replace"`` so output is always valid text.

The distributed form (``decode_html_bytes``) is one Arrow-batched
mapInPandas pass adding (text, charset) — the decode seam between the
fetch stage's binary payload and the byte-identical extraction stage.
"""

from __future__ import annotations

import codecs
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

SNIFF_WINDOW = 1024  # spec prescan window

# WHATWG label → python codec (subset: the labels that occur in practice;
# https://encoding.spec.whatwg.org/#names-and-labels)
_LABEL_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "latin1": "windows-1252", "latin-1": "windows-1252",
    "iso-8859-1": "windows-1252", "iso8859-1": "windows-1252",
    "ascii": "windows-1252", "us-ascii": "windows-1252",
    "iso-8859-2": "iso-8859-2", "iso-8859-15": "iso-8859-15",
    "windows-1251": "windows-1251", "koi8-r": "koi8-r",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "euc-jp": "euc_jp", "gbk": "gbk", "gb2312": "gbk", "gb18030": "gb18030",
    "big5": "big5", "euc-kr": "euc_kr",
}

_META_CHARSET = re.compile(rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.I)
_HEADER_CHARSET = re.compile(r"""charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.I)


def normalize_label(label: str | None) -> str | None:
    """WHATWG label → python codec name, or None for unknown/empty."""
    if not label:
        return None
    name = _LABEL_ALIASES.get(label.strip().lower())
    if name is None:
        return None
    try:
        codecs.lookup(name)
    except LookupError:  # pragma: no cover — aliases map to stdlib codecs
        return None
    return name


def sniff_charset(payload: bytes, content_type: str | None = None) -> str:
    """Resolve the charset of an HTML payload (precedence in the module
    docstring). Always returns a decodable codec name."""
    if payload.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if payload.startswith(b"\xff\xfe"):
        return "utf-16-le"
    if payload.startswith(b"\xfe\xff"):
        return "utf-16-be"
    if content_type:
        m = _HEADER_CHARSET.search(content_type)
        if m:
            name = normalize_label(m.group(1))
            if name:
                return name
    m = _META_CHARSET.search(payload[:SNIFF_WINDOW])
    if m:
        name = normalize_label(m.group(1).decode("ascii", "replace"))
        if name:
            return name
    return "windows-1252"


def decode_html(payload: bytes, content_type: str | None = None) -> tuple[str, str]:
    """(decoded text, resolved charset). Total: never raises on content —
    the resolved codec decodes with errors='replace'."""
    cs = sniff_charset(payload, content_type)
    return payload.decode(cs, errors="replace"), cs


DECODED_FIELDS = [StructField("text", StringType()), StructField("charset", StringType())]


def decode_html_bytes(
    df: DataFrame,
    payload_col: str = "html",
    content_type_col: str | None = None,
    out_text: str = "text",
    out_charset: str = "charset",
) -> DataFrame:
    """Add (decoded text, resolved charset) columns from a binary HTML
    column — one Arrow-batched mapInPandas pass, null-safe (null payload →
    null text/charset)."""
    schema = StructType(
        list(df.schema.fields)
        + [StructField(out_text, StringType()), StructField(out_charset, StringType())]
    )
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, charsets = [], []
            ctypes = pdf[content_type_col] if content_type_col else None
            for i, payload in enumerate(pdf[payload_col]):
                if payload is None:
                    texts.append(None)
                    charsets.append(None)
                    continue
                ct = None if ctypes is None else ctypes.iloc[i]
                t, cs = decode_html(bytes(payload), ct)
                texts.append(t)
                charsets.append(cs)
            pdf = pdf.copy()
            pdf[out_text] = texts
            pdf[out_charset] = charsets
            yield pdf[cols + [out_text, out_charset]]

    return df.mapInPandas(run, schema)
