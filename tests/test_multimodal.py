

def test_sniff_content_type_magic_bytes(spark):
    from spider_spark.operators.multimodal import sniff_content_type

    cases = [
        ("pdf", b"%PDF-1.7 blah", "application/pdf"),
        ("png", bytes.fromhex("89504E470D0A1A0A") + b"x", "image/png"),
        ("gif87", b"GIF87a....", "image/gif"),
        ("gif89", b"GIF89a....", "image/gif"),
        ("jpg", bytes.fromhex("FFD8FFE0") + b"JFIF", "image/jpeg"),
        ("zip", b"PK\x03\x04docx", "application/zip"),
        ("gz", bytes.fromhex("1F8B08"), "application/gzip"),
        ("riff", b"RIFF\x00\x00\x00\x00WAVE", "riff"),
        ("html", b"<!DOCTYPE html><p>x", "text/html"),
        ("htmllow", b"<html><body>", "text/html"),
        ("rtf", b"{\\rtf1 x}", "application/rtf"),
        ("plain", b"just some text", None),
        ("short", b"%P", None),  # shorter than any signature
        ("empty", b"", None),
        ("null", None, None),
    ]
    df = spark.createDataFrame(
        [(n, c) for n, c, _ in cases], "name string, content binary"
    )
    got = {
        r["name"]: (r["sniffed_type"], r["type_sniffable"])
        for r in sniff_content_type(df).collect()
    }
    for n, _, want in cases:
        assert got[n] == (want, want is not None), n
