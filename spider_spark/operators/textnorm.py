"""Unicode text normalization and mojibake repair — the cleanup pass a
web-text corpus needs BEFORE hashing, deduplication, or tokenization.

Web pages reach the pipeline in inconsistent Unicode forms: the same
visible string can be composed (NFC 'é') or decomposed (e+U+0301), and a
mis-labelled charset upstream turns UTF-8 bytes into cp1252/latin-1
"mojibake" ('Ã©' for 'é', 'â€œ' for '“'). Both break exact dedup (equal
texts hash unequal), inflate token counts, and leak garbage into
training data — so normalization must run before `dedup`/`textqc`, and
must be deterministic (same text → same bytes on every engine, every
cluster size).

Implementation notes (the 100 TB audit):
- Both transforms are Arrow-batched pandas UDFs (`pandas_udf`), never
  per-row Python UDFs. Pure projection — no shuffle; they pipeline into
  whatever scan feeds them.
- The ASCII fast path is taken INSIDE the UDF (`str.isascii()` is a
  C-level check): gating with ``F.when`` outside wouldn't help, Spark
  extracts Python UDFs into an ArrowEvalPython node that evaluates the
  UDF for every row regardless of the surrounding conditional.
- NFC is the right default for dedup keys (W3C's choice for the web);
  NFKC additionally folds compatibility forms (ﬁ→fi, ① → 1) — useful
  for matching, lossy for display — so the form is a parameter.

Mojibake repair is the ftfy-lite core (public algorithm, Speer 2012):
a garbled string is UTF-8 bytes that were *decoded* as cp1252/latin-1,
so the inverse —
re-encode with cp1252 (latin-1 as fallback for the 5 bytes cp1252
leaves undefined), then decode as UTF-8 — restores the original. The
repair is attempted only when the text carries the statistical
signature of that mistake (UTF-8 lead-byte characters Ã/Â/â/ â€¦), is
accepted only when the round-trip decodes cleanly, and is applied a
bounded number of rounds (doubly-garbled text needs two).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Repair trigger: misread UTF-8 lead bytes 0xC2/0xC3 (the entire
#: Latin-1 Supplement — é, ü, ñ …) and 0xE2 (General Punctuation —
#: curly quotes, dashes, ellipsis) render as Â/Ã/â. These three cover
#: the overwhelming mass of real-web mojibake AND are high-precision:
#: broadening the trigger to all lead bytes (Ä…ô) makes correct text
#: like "é—“" (bytes E9 97 93 — a valid UTF-8 encoding of a CJK char)
#: look like mojibake and get falsely "repaired". Precision over
#: recall: CJK-lead mojibake (ä/å/æ/ç/è/é leads) is left alone by
#: design. Presence is only the trigger — acceptance still requires
#: the inverse round-trip to decode cleanly.
_MOJIBAKE_MARK = re.compile("[ÂÃâ]")


def _utf8_unscramble(s: str) -> str | None:
    """One inverse round: text → cp1252 bytes (latin-1 for the 5 holes)
    → UTF-8 decode. None if the text was not mojibake after all."""
    try:
        raw = s.encode("cp1252")
    except UnicodeEncodeError:
        try:
            raw = s.encode("latin-1")
        except UnicodeEncodeError:
            return None
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return None


def fix_mojibake_text(s: str, max_rounds: int = 2) -> str:
    """Pure-Python core (shared with tests): bounded repair rounds,
    each accepted only if the marker signature is present and the
    inverse round-trip decodes cleanly."""
    for _ in range(max_rounds):
        if not s or s.isascii() or not _MOJIBAKE_MARK.search(s):
            return s
        fixed = _utf8_unscramble(s)
        if fixed is None or fixed == s:
            return s
        s = fixed
    return s


@F.pandas_udf(T.StringType())
def _nfc_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in it:
        yield s.map(
            lambda t: t
            if t is None or t.isascii()
            else unicodedata.normalize("NFC", t)
        )


@F.pandas_udf(T.StringType())
def _nfkc_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # NFKC has no ASCII fast-path skip issue either (ASCII is NFKC-stable)
    for s in it:
        yield s.map(
            lambda t: t
            if t is None or t.isascii()
            else unicodedata.normalize("NFKC", t)
        )


@F.pandas_udf(T.StringType())
def _mojibake_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in it:
        yield s.map(lambda t: t if t is None else fix_mojibake_text(t))


_FORMS = {"NFC": _nfc_udf, "NFKC": _nfkc_udf}


def col_normalize_unicode(text: str | Column, form: str = "NFC") -> Column:
    """Unicode-normalized text column (NFC or NFKC), Arrow-batched."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {sorted(_FORMS)}, got {form!r}")
    c = F.col(text) if isinstance(text, str) else text
    return _FORMS[form](c)


def normalize_unicode(
    docs: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    out_col: str | None = None,
) -> DataFrame:
    """Replace (or add) the normalized text column. Pure projection."""
    return docs.withColumn(out_col or text_col, col_normalize_unicode(text_col, form))


def col_fix_mojibake(text: str | Column) -> Column:
    """Mojibake-repaired text column (ftfy-lite inverse transcoding)."""
    c = F.col(text) if isinstance(text, str) else text
    return _mojibake_udf(c)


def fix_mojibake(
    docs: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Repair cp1252/latin-1-misdecoded UTF-8 in ``text_col``. Pure
    projection; non-mojibake text passes through byte-identical."""
    return docs.withColumn(out_col or text_col, col_fix_mojibake(text_col))


@F.pandas_udf(T.StringType())
def _garble_cp1252_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in it:
        yield s.map(
            lambda t: None if t is None else t.encode("utf-8").decode("cp1252")
        )


def col_garble_cp1252(text: str | Column) -> Column:
    """TEST-HARNESS transform (not an engine path): simulate the
    upstream charset bug by decoding the text's UTF-8 bytes as cp1252 —
    the exact corruption ``fix_mojibake`` inverts. Exists so oracle
    queries and benchmarks can manufacture realistic mojibake
    deterministically; raises (task error) if the text's UTF-8 bytes
    hit one of cp1252's five undefined bytes, so fixtures must stick to
    cp1252-mappable characters."""
    c = F.col(text) if isinstance(text, str) else text
    return _garble_cp1252_udf(c)


def col_strip_control_chars(text: str | Column) -> Column:
    """Drop C0/C1 control characters except tab/newline/CR — pure
    Catalyst regexp, whole-stage codegen (the cheap pre-pass; run it
    AFTER mojibake repair, which needs the C1 bytes as evidence)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]", "")
