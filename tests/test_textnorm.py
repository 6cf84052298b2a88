"""Unicode normalization + mojibake repair (operators/textnorm.py).

Python-level cases pin the repair/normalize semantics against stdlib
ground truth; DataFrame-level cases pin the Spark plumbing (Arrow
batching, nulls, determinism). Source is ASCII-only — every non-ASCII
char is an explicit escape so editors/toolchains can't renormalize the
fixtures.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from spider_spark.operators import textnorm


def garble(s: str, encoding: str = "cp1252") -> str:
    """Simulate the upstream bug: UTF-8 bytes decoded as cp1252/latin-1."""
    return s.encode("utf-8").decode(encoding)


def test_fix_single_round_cp1252():
    # “ and — garble through cp1252 cleanly (no 0x81/8D/8F/90/9D
    # holes in their UTF-8 bytes); ” would hit 0x9D — covered by the
    # latin-1 fallback test below.
    orig = "café — “smart quotes, naïve"
    assert garble(orig) != orig
    assert textnorm.fix_mojibake_text(garble(orig)) == orig


def test_fix_double_garbled_two_rounds():
    orig = "déjà vu"
    twice = garble(garble(orig))
    assert textnorm.fix_mojibake_text(twice, max_rounds=2) == orig
    # one round only gets halfway
    assert textnorm.fix_mojibake_text(twice, max_rounds=1) == garble(orig)


def test_fix_latin1_fallback_for_cp1252_holes():
    # ” encodes to E2 80 9D; 0x9D is undefined in cp1252, so the
    # garble arrives latin-1-decoded and repair must fall back to the
    # latin-1 encoder.
    orig = "x ”quoted” y"
    garbled = orig.encode("utf-8").decode("latin-1")
    assert garbled != orig
    assert textnorm.fix_mojibake_text(garbled) == orig


def test_legit_accents_untouched():
    for s in [
        "café résumé",
        "naïve",
        "Äpfel über",
        "ASCII only",
        "",
    ]:
        assert textnorm.fix_mojibake_text(s) == s


def test_marker_without_valid_utf8_untouched():
    s = "Ã without continuation"
    assert textnorm.fix_mojibake_text(s) == s


def test_nfc_matches_stdlib(spark):
    rows = [
        (1, "Café"),  # decomposed: e + combining acute
        (2, "Ångström"),  # combining ring + diaeresis
        (3, "plain ascii"),
        (4, None),
        (5, "already é composed"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.text for r in textnorm.normalize_unicode(df).collect()}
    for i, t in rows:
        want = None if t is None else unicodedata.normalize("NFC", t)
        assert got[i] == want
    assert got[1] == "Caf\u00e9"  # really recomposed, not passthrough


def test_nfkc_folds_compatibility(spark):
    # ﬁ = fi ligature, ① = circled one, ½ = vulgar half
    df = spark.createDataFrame(
        [(1, "ﬁle ① ½")], "id long, text string"
    )
    got = textnorm.normalize_unicode(df, form="NFKC").collect()[0].text
    assert got == unicodedata.normalize("NFKC", "ﬁle ① ½")
    assert "fi" in got and "1" in got


def test_bad_form_raises(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    try:
        textnorm.normalize_unicode(df, form="NFD-ISH")
        assert False, "should raise"
    except ValueError:
        pass


def test_mojibake_dataframe_roundtrip(spark):
    originals = [
        "café — “q, ok",
        "déjà vu",
        "plain",
        "naïve ü",
    ]
    rows = [(i, garble(t)) for i, t in enumerate(originals)]
    rows.append((99, None))
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.text for r in textnorm.fix_mojibake(df).collect()}
    for i, t in enumerate(originals):
        assert got[i] == t
    assert got[99] is None


def test_strip_control_chars_keeps_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "a\x00b\tc\nd\x7fe\x9ff")], "id long, text string"
    )
    got = df.select(
        textnorm.col_strip_control_chars("text").alias("t")
    ).collect()[0].t
    assert got == "ab\tc\ndef"


def test_normalization_before_dedup_story(spark):
    """The pipeline motivation: NFC makes visually-equal docs hash-equal."""
    df = spark.createDataFrame(
        [(1, "Café"), (2, "Café")], "id long, text string"
    )
    n = textnorm.normalize_unicode(df)
    hashes = n.select(F.md5("text").alias("h")).distinct().count()
    assert hashes == 1
    raw = df.select(F.md5("text").alias("h")).distinct().count()
    assert raw == 2


def test_no_overcorrection_of_cjk_lookalike():
    # "\u00e9\u2014\u201c" encodes (cp1252) to E9 97 93 \u2014 bytes that ARE
    # a valid UTF-8 encoding of a CJK char \u2014 so a naive second repair
    # round would destroy correct text. The narrowed [\u00c2\u00c3\u00e2] trigger
    # must leave it alone (the bug the trigger exists to prevent).
    s = "able key \u00e9\u2014\u201cok"
    assert textnorm.fix_mojibake_text(s, max_rounds=5) == s
