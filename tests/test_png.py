"""PNG codec tests: from-scratch decoder (stdlib zlib + numpy) over the
public W3C PNG spec / RFC 2083.

Covers: roundtrip through every scanline filter (0-4), all five bit-depth-8
color types (hand-built payloads, not the encoder, so the decoder is tested
against the spec rather than against itself), CRC/truncation/unsupported
rejection, and the Spark mapInPandas feature/resize paths over PNG corpora.
Reference parity target: the same decode → features contract as the netpbm
path (multimodal.extract_image_features)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from spider_spark.operators import multimodal as mm


def _build(ctype: int, px: bytes, w: int, h: int, plte: bytes | None = None,
           ftype: int = 0, depth: int = 8, interlace: int = 0) -> bytes:
    """Hand-assemble a PNG from raw (unfiltered) sample bytes."""
    chans = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = b"".join(bytes([ftype]) + px[y * w * chans:(y + 1) * w * chans] for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    body = mm.PNG_SIG + mm._png_chunk(b"IHDR", ihdr)
    if plte is not None:
        body += mm._png_chunk(b"PLTE", plte)
    return body + mm._png_chunk(b"IDAT", zlib.compress(raw)) + mm._png_chunk(b"IEND", b"")


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(ftype):
    rng = np.random.RandomState(11 + ftype)
    arr = rng.randint(0, 256, size=(13, 17, 3)).astype(np.uint8)
    assert np.array_equal(mm.decode_png(mm.encode_png(arr, filter_type=ftype)), arr)


def test_roundtrip_extreme_shapes():
    for h, w in [(1, 1), (1, 64), (64, 1), (3, 3)]:
        arr = (np.arange(h * w * 3) % 256).astype(np.uint8).reshape(h, w, 3)
        for ftype in range(5):
            assert np.array_equal(mm.decode_png(mm.encode_png(arr, filter_type=ftype)), arr)


def test_grayscale_expands_to_rgb():
    d = mm.decode_png(_build(0, bytes(range(12)), 4, 3))
    assert d.shape == (3, 4, 3)
    assert np.array_equal(d[..., 0], d[..., 1]) and np.array_equal(d[..., 0], d[..., 2])
    assert d[1, 2, 0] == 6  # row-major sample order


def test_rgba_drops_alpha():
    px = bytes(range(24))  # 3x2 RGBA
    d = mm.decode_png(_build(6, px, 3, 2))
    assert d.shape == (2, 3, 3)
    assert tuple(d[0, 0]) == (0, 1, 2) and tuple(d[0, 1]) == (4, 5, 6)
    assert tuple(d[1, 2]) == (20, 21, 22)


def test_palette_expands_through_plte():
    plte = bytes([10, 20, 30, 40, 50, 60])
    d = mm.decode_png(_build(3, bytes([0, 1, 1, 0]), 2, 2, plte=plte))
    assert tuple(d[0, 0]) == (10, 20, 30) and tuple(d[0, 1]) == (40, 50, 60)
    assert tuple(d[1, 1]) == (10, 20, 30)


def test_palette_without_plte_rejected():
    with pytest.raises(ValueError, match="PLTE"):
        mm.decode_png(_build(3, bytes([0, 0]), 2, 1))


def test_gray_alpha_drops_alpha():
    d = mm.decode_png(_build(4, bytes([100, 255, 50, 0]), 2, 1))
    assert tuple(d[0, 0]) == (100, 100, 100) and tuple(d[0, 1]) == (50, 50, 50)


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_hand_filtered_scanlines_decode(ftype):
    """Filter the scanlines by hand (per the spec equations, not via the
    encoder's helper) and check the decoder inverts them."""
    arr = (np.arange(5 * 4 * 3) % 251).astype(np.uint8).reshape(5, 4, 3)
    bpp = 3
    prev = np.zeros(4 * 3, dtype=np.int32)
    raw = b""
    for y in range(5):
        cur = arr[y].reshape(-1).astype(np.int32)
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - (left + prev) // 2
        else:
            pred = [mm._paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prev, upleft)]
            filt = cur - np.array(pred, np.int32)
        raw += bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
    payload = (mm.PNG_SIG + mm._png_chunk(b"IHDR", ihdr)
               + mm._png_chunk(b"IDAT", zlib.compress(raw)) + mm._png_chunk(b"IEND", b""))
    assert np.array_equal(mm.decode_png(payload), arr)


def test_multi_idat_chunks_concatenate():
    arr = (np.arange(4 * 4 * 3) % 256).astype(np.uint8).reshape(4, 4, 3)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(4))
    z = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    payload = (mm.PNG_SIG + mm._png_chunk(b"IHDR", ihdr)
               + mm._png_chunk(b"IDAT", z[:7]) + mm._png_chunk(b"IDAT", z[7:])
               + mm._png_chunk(b"IEND", b""))
    assert np.array_equal(mm.decode_png(payload), arr)


def test_ancillary_chunks_skipped():
    arr = np.full((2, 2, 3), 9, np.uint8)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(2))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    payload = (mm.PNG_SIG + mm._png_chunk(b"IHDR", ihdr)
               + mm._png_chunk(b"tEXt", b"Comment\x00hi")
               + mm._png_chunk(b"IDAT", zlib.compress(raw)) + mm._png_chunk(b"IEND", b""))
    assert np.array_equal(mm.decode_png(payload), arr)


def test_bad_crc_rejected():
    b = bytearray(mm.encode_png(np.zeros((2, 2, 3), np.uint8)))
    b[20] ^= 0xFF  # flip a bit inside IHDR data
    with pytest.raises(ValueError, match="crc"):
        mm.decode_png(bytes(b))


def test_truncated_payload_rejected():
    p = mm.encode_png(np.zeros((3, 3, 3), np.uint8))
    with pytest.raises(ValueError):
        mm.decode_png(p[:-6])  # IEND gone
    with pytest.raises(ValueError):
        mm.decode_png(p[: len(p) // 2])


def test_unsupported_variants_rejected():
    px = bytes(12)
    with pytest.raises(ValueError, match="8-bit"):
        mm.decode_png(_build(2, px, 2, 2, depth=16))
    with pytest.raises(ValueError, match="8-bit"):
        mm.decode_png(_build(2, px, 2, 2, interlace=1))
    with pytest.raises(ValueError, match="not a png"):
        mm.decode_png(b"GIF89a" + bytes(20))


def test_wrong_idat_length_rejected():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    payload = (mm.PNG_SIG + mm._png_chunk(b"IHDR", ihdr)
               + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
               + mm._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="length"):
        mm.decode_png(payload)


# --- Spark plumbing over PNG corpora ----------------------------------------


def test_png_features_match_ppm_features(spark):
    """Same gradient corpus encoded as PNG and PPM must produce identical
    decoded features — the PNG path is a second real codec behind the same
    mapInPandas kernel (differential discipline, src/index.spec.ts:70-99)."""
    png = mm.extract_image_features(mm.generate_png_images(spark, 24)).orderBy("media_id")
    ppm = mm.extract_image_features(mm.generate_ppm_images(spark, 24)).orderBy("media_id")
    a, b = png.collect(), ppm.collect()
    assert len(a) == 24
    for ra, rb in zip(a, b):
        assert (ra["media_id"], ra["width"], ra["height"]) == (rb["media_id"], rb["width"], rb["height"])
        assert np.allclose(ra["embedding"], rb["embedding"], atol=1e-6)


def test_png_resize_real(spark):
    media = mm.generate_png_images(spark, 8)
    out = {r["media_id"]: r for r in mm.resize_images(media, max_px=8).collect()}
    assert len(out) == 8
    for i, r in out.items():
        assert max(r["width"], r["height"]) <= 8
        arr = mm.decode_png(bytes(r["payload"]))  # payload stays a real PNG
        assert arr.shape == (r["height"], r["width"], 3)
        # blue channel is constant id%256 in the generator — survives resize
        assert int(arr[0, 0, 2]) == i % 256


def test_corrupt_png_row_yields_null_features(spark):
    media = mm.generate_png_images(spark, 4)
    from pyspark.sql import functions as F
    # truncate payloads for even ids: decode must fail soft (null row)
    poisoned = media.withColumn(
        "payload",
        F.when(F.col("media_id") % 2 == 0, F.expr("substring(payload, 1, 40)")).otherwise(F.col("payload")),
    )
    rows = {r["media_id"]: r for r in mm.extract_image_features(poisoned).collect()}
    assert len(rows) == 4
    for i, r in rows.items():
        if i % 2 == 0:
            assert r["embedding"] is None and r["width"] is None
        else:
            assert r["embedding"] is not None
