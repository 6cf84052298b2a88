"""GIF + baseline-JPEG codec tests (pure-Python kernels, no Spark).

GIF is lossless → exact roundtrips. JPEG is lossy → differential bounds:
encode with the ITU T.81 Annex K example tables, decode, assert the error
stays inside the quantization budget; flat rasters at quality 100 must be
EXACT (zero AC energy, all-ones quant table), which is the invariant the
oracle-backed `multimodal_jpeg_decode` entry query leans on.
"""

from __future__ import annotations

import numpy as np
import pytest

from spider_spark.operators.imagecodecs import (
    _lzw_compress,
    _lzw_decompress,
    decode_gif,
    decode_jpeg,
    encode_gif,
    encode_jpeg,
)


def _rng(seed=7):
    return np.random.RandomState(seed)


# --- GIF ---------------------------------------------------------------------


def test_lzw_roundtrip_random():
    rng = _rng()
    for min_code in (2, 4, 8):
        syms = rng.randint(0, 1 << min_code, 5000).astype(np.uint8)
        out = _lzw_decompress(_lzw_compress(syms, min_code), min_code, len(syms))
        assert np.array_equal(out, syms)


def test_lzw_table_reset_path():
    # high-entropy stream long enough to exhaust 4096 codes repeatedly
    rng = _rng(3)
    syms = rng.randint(0, 256, 120_000).astype(np.uint8)
    out = _lzw_decompress(_lzw_compress(syms, 8), 8, len(syms))
    assert np.array_equal(out, syms)


def test_gif_roundtrip_exact():
    rng = _rng()
    pal = rng.randint(0, 256, (37, 3)).astype(np.uint8)
    idx = rng.randint(0, 37, (23, 31)).astype(np.uint8)
    frames = decode_gif(encode_gif(idx, pal))
    assert len(frames) == 1
    assert np.array_equal(frames[0], pal[idx])


def test_gif_interlace_roundtrip():
    rng = _rng(11)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    for h in (1, 2, 5, 8, 13, 40):  # heights around the pass boundaries
        idx = rng.randint(0, 16, (h, 9)).astype(np.uint8)
        got = decode_gif(encode_gif(idx, pal, interlace=True))[0]
        assert np.array_equal(got, pal[idx]), f"h={h}"


def test_gif_animation_frames_compose():
    rng = _rng(5)
    pal = rng.randint(0, 256, (64, 3)).astype(np.uint8)
    frames = [rng.randint(0, 64, (16, 20)).astype(np.uint8) for _ in range(5)]
    out = decode_gif(encode_gif(frames, pal))
    assert len(out) == 5
    for f, o in zip(frames, out):
        assert np.array_equal(o, pal[f])


def test_gif_max_frames_stops_early():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    frames = [np.full((4, 4), i % 2, dtype=np.uint8) for i in range(6)]
    out = decode_gif(encode_gif(frames, pal), max_frames=2)
    assert len(out) == 2


def test_gif_transparency_keeps_underlying_pixel():
    # frame 2 marks index 0 transparent → those pixels keep frame 1's color
    pal = np.array([[10, 10, 10], [200, 50, 50]], dtype=np.uint8)
    f1 = np.ones((4, 4), dtype=np.uint8)
    f2 = np.zeros((4, 4), dtype=np.uint8)
    f2[0, 0] = 1
    out = decode_gif(encode_gif([f1, f2], pal, transparent_index=0))
    assert np.array_equal(out[0], pal[f1])
    # transparent zeros show through as frame-1 red; the (0,0) opaque 1 stays
    assert np.array_equal(out[1][1, 1], pal[1])
    assert np.array_equal(out[1][0, 0], pal[1])


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 4)  # truncated descriptor
    pal = np.array([[1, 2, 3]], dtype=np.uint8)
    good = encode_gif(np.zeros((3, 3), dtype=np.uint8), pal)
    with pytest.raises(ValueError):
        decode_gif(good[:-10])  # truncated stream


def test_gif_single_color_palette():
    pal = np.array([[9, 8, 7]], dtype=np.uint8)
    idx = np.zeros((5, 7), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx, pal))[0], pal[idx])


# --- JPEG --------------------------------------------------------------------


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1), (xx + yy) % 256],
        axis=2,
    ).astype(np.uint8)


def test_jpeg_flat_q100_is_exact():
    for color in ((0, 0, 0), (255, 255, 255), (120, 64, 200), (1, 254, 128)):
        arr = np.tile(np.array(color, dtype=np.uint8), (24, 40, 1))
        dec = decode_jpeg(encode_jpeg(arr, quality=100))
        assert np.array_equal(dec, arr), color


def test_jpeg_gradient_within_quant_budget():
    grad = _gradient(33, 47)
    for q, bound in ((50, 5.0), (90, 2.0), (100, 0.6)):
        dec = decode_jpeg(encode_jpeg(grad, quality=q))
        err = np.abs(dec.astype(int) - grad.astype(int))
        assert err.mean() < bound, (q, err.mean())


def test_jpeg_420_subsampling_decodes():
    grad = _gradient(33, 47)
    dec = decode_jpeg(encode_jpeg(grad, quality=90, subsample=True))
    assert dec.shape == grad.shape
    err = np.abs(dec.astype(int) - grad.astype(int))
    assert err.mean() < 4.0  # chroma is half-res: looser bound


def test_jpeg_restart_markers_all_intervals():
    grad = _gradient(24, 40)  # 15 MCUs at 4:4:4
    base = decode_jpeg(encode_jpeg(grad, quality=90))
    for ri in (1, 2, 3, 7):
        dec = decode_jpeg(encode_jpeg(grad, quality=90, restart_interval=ri))
        # restart markers change the bitstream, not the decoded raster
        assert np.array_equal(dec, base), ri


def test_jpeg_grayscale():
    g = (np.mgrid[0:17, 0:29][1] * 255 // 28).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == (17, 29, 3)
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 2


def test_jpeg_non_mcu_multiple_dimensions():
    # 4:2:0 MCUs are 16×16 — force edge padding on both axes
    grad = _gradient(19, 21)
    dec = decode_jpeg(encode_jpeg(grad, quality=90, subsample=True))
    assert dec.shape == (19, 21, 3)


def test_jpeg_rejects_progressive_and_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x11not a jpeg")
    good = bytearray(encode_jpeg(_gradient(8, 8), quality=90))
    sof = good.find(b"\xff\xc0")
    good[sof + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good))


def test_jpeg_byte_stuffing_survives():
    # white image produces long runs of 1-bits → guaranteed 0xFF bytes in
    # the entropy stream → stuffing path exercised both directions
    arr = np.full((16, 16, 3), 255, dtype=np.uint8)
    payload = encode_jpeg(arr, quality=100)
    assert decode_jpeg(payload).shape == (16, 16, 3)
    assert np.array_equal(decode_jpeg(payload), arr)
