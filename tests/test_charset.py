"""Charset sniffing/decoding (spider_spark/charset.py): WHATWG-subset
precedence (BOM > header > meta > windows-1252), alias normalization
(latin1/ascii → windows-1252 per spec), total decode, Spark pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import charset as cs


def test_bom_wins_over_everything():
    payload = ("\ufeff" + "title café").encode("utf-16-le")
    # utf-16-le BOM = ff fe; header lies
    assert cs.sniff_charset(payload, "text/html; charset=utf-8") == "utf-16-le"
    text, resolved = cs.decode_html(payload, "text/html; charset=utf-8")
    assert "title café" in text and resolved == "utf-16-le"
    assert cs.sniff_charset(("\ufeff" + "x").encode("utf-8")) == "utf-8-sig"
    assert cs.sniff_charset(("\ufeff" + "x").encode("utf-16-be")) == "utf-16-be"


def test_header_beats_meta():
    payload = b'<meta charset="shift_jis"><p>caf\xe9</p>'
    assert cs.sniff_charset(payload, "text/html; charset=windows-1251") == "windows-1251"
    assert cs.sniff_charset(payload, None) == "shift_jis"


def test_meta_variants_and_window():
    assert cs.sniff_charset(b"<meta charset=utf-8>") == "utf-8"
    assert cs.sniff_charset(b"<META CHARSET='UTF-8'>") == "utf-8"
    http_equiv = (b'<meta http-equiv="Content-Type" '
                  b'content="text/html; charset=iso-8859-2">')
    assert cs.sniff_charset(http_equiv) == "iso-8859-2"
    # declaration outside the 1024-byte prescan window is not seen
    far = b" " * 2000 + b'<meta charset="utf-16le">'
    assert cs.sniff_charset(far) == "windows-1252"


def test_whatwg_aliases():
    assert cs.normalize_label("Latin1") == "windows-1252"
    assert cs.normalize_label("ISO-8859-1") == "windows-1252"
    assert cs.normalize_label("ascii") == "windows-1252"
    assert cs.normalize_label("GB2312") == "gbk"
    assert cs.normalize_label("no-such-charset") is None
    assert cs.normalize_label(None) is None


def test_unknown_label_falls_through():
    payload = b'<meta charset="klingon"><p>caf\xe9</p>'
    # unknown header label → meta; unknown meta label → windows-1252
    assert cs.sniff_charset(payload, "text/html; charset=klingon") == "windows-1252"
    text, resolved = cs.decode_html(payload)
    assert resolved == "windows-1252" and "café" in text


def test_windows_1252_fallback_decodes_every_byte():
    payload = bytes(range(256))
    text, resolved = cs.decode_html(payload)
    assert resolved == "windows-1252"
    assert len(text) == 256  # total function: every byte maps
    assert "€" in text  # 0x80 is € in cp1252, not a C1 control


def test_utf8_with_meta_roundtrip():
    body = "<meta charset=utf-8><p>naïve — ☃</p>"
    text, resolved = cs.decode_html(body.encode("utf-8"))
    assert resolved == "utf-8" and "naïve — ☃" in text


def test_replacement_on_invalid_bytes():
    payload = b"<meta charset=utf-8>ok \xff\xfe tail"
    text, resolved = cs.decode_html(payload)
    assert resolved == "utf-8" and "�" in text and "tail" in text


def test_decode_html_bytes_spark(spark):
    rows = [
        (0, "<meta charset=utf-8><p>café ☃</p>".encode("utf-8"), None),
        (1, "<p>caf\xe9</p>".encode("windows-1252"), "text/html; charset=latin1"),
        (2, ("\ufeff" + "wide text").encode("utf-16-le"), None),
        (3, None, None),
        (4, "<p>плохой</p>".encode("windows-1251"),
         "text/html; charset=windows-1251"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "html", "content_type"])
    out = {r["doc_id"]: r for r in
           cs.decode_html_bytes(df, "html", "content_type").collect()}
    assert out[0]["charset"] == "utf-8" and "café ☃" in out[0]["text"]
    assert out[1]["charset"] == "windows-1252" and "café" in out[1]["text"]
    assert out[2]["charset"] == "utf-16-le" and out[2]["text"] == ("\ufeff" + "wide text")
    assert out[3]["text"] is None and out[3]["charset"] is None
    assert out[4]["charset"] == "windows-1251" and "плохой" in out[4]["text"]
