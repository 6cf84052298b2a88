"""From-scratch GIF and baseline-JPEG codecs (stdlib + numpy only).

This container has no Pillow/ffmpeg, so the multimodal operators
(`multimodal.py`) ship their own decoders for formats whose public specs
are implementable by hand. This module adds:

- **GIF87a/GIF89a: REAL decode + encode** — logical screen descriptor,
  global/local color tables, full variable-code-width LZW in both
  directions (with code-table reset), interlaced row ordering, Graphic
  Control Extension transparency/disposal, and **multi-frame animation**
  (frame composition over the previous canvas per the disposal method).
  Animated GIF is the one genuinely moving-image format this sandbox can
  produce and parse for real, so `multimodal.sample_video_frames` uses it
  as its REAL path.
- **JPEG/JFIF baseline (ITU T.81 sequential DCT, 8-bit): REAL decode**,
  plus a minimal baseline **encoder** used by the tests as a differential
  (encode a known raster with the spec's example tables, decode it back,
  assert per-pixel error within the quantization bound). Decoder covers:
  DQT (8-bit tables), SOF0, DHT, SOS with byte-stuffing and restart
  markers, per-MCU Huffman DC/AC decode, dequantization, 2-D IDCT, chroma
  upsampling for 4:4:4 / 4:2:2 / 4:2:0, YCbCr→RGB (JFIF full-range), and
  grayscale.

Reference parity note: the spider reference treats image/video bodies as
opaque downloads (reference `src/scrapers.ts` download handling); decoding
is this repo's training-data-pipeline extension, per the build brief. All
formats implemented from their public specs (GIF89a specification, ITU
T.81 / JFIF 1.02) — no third-party code.
"""

from __future__ import annotations

import struct

import numpy as np

# =============================================================================
# GIF
# =============================================================================

GIF_SIGS = (b"GIF87a", b"GIF89a")

# Interlace pass structure: (row offset, row step) per GIF89a appendix E.
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emits Clear up front, resets the table at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1

    emit(clear, width)
    prefix = b""
    for v in indices.astype(np.uint8).tobytes():
        sym = bytes([v])
        cand = prefix + sym
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            # table full: reset (decoder must honor Clear mid-stream)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = sym
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """Inverse of :func:`_lzw_compress`; stops after ``expected`` pixels or
    EOI, whichever first (broken encoders pad trailing garbage)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    pos = 0  # bit position
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > nbits:
            return eoi  # truncated stream: treat as end
        byte0 = pos >> 3
        # codes are ≤12 bits → at most 3 bytes straddle
        chunk = int.from_bytes(data[byte0 : byte0 + 3].ljust(3, b"\0"), "little")
        val = (chunk >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        return val

    out = np.empty(expected, dtype=np.uint8)
    n_out = 0

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None

    while n_out < expected:
        code = read(width)
        if code == eoi:
            break
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first code after clear out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        take = min(len(entry), expected - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out < expected:
        raise ValueError("gif: LZW stream ended before raster was complete")
    return out


def _sub_blocks(payload: bytes, idx: int) -> tuple[bytes, int]:
    """Read a GIF sub-block chain starting at idx → (joined bytes, next idx)."""
    chunks = []
    while True:
        if idx >= len(payload):
            raise ValueError("gif: truncated sub-block chain")
        n = payload[idx]
        idx += 1
        if n == 0:
            return b"".join(chunks), idx
        chunks.append(payload[idx : idx + n])
        if len(chunks[-1]) != n:
            raise ValueError("gif: truncated sub-block")
        idx += n


def _write_sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Reorder interlaced GIF rows (pass structure per the spec) → natural."""
    h = rows.shape[0]
    order = [r for off, step in _INTERLACE_PASSES for r in range(off, h, step)]
    out = np.empty_like(rows)
    out[np.asarray(order)] = rows
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [r for off, step in _INTERLACE_PASSES for r in range(off, h, step)]
    return rows[np.asarray(order)]


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    palette: np.ndarray,
    delay_cs: int = 4,
    interlace: bool = False,
    transparent_index: int | None = None,
) -> bytes:
    """palette-indexed frame(s) → GIF bytes.

    ``frames``: one (h, w) uint8 index array or a list of them (animated);
    ``palette``: (n, 3) uint8, n ≤ 256. Every frame must share the canvas
    size (full-frame replacement, disposal 1) — enough for the synthetic
    corpora while keeping the encoder honest to the spec.
    """
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("gif: need at least one frame")
    h, w = frames[0].shape
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError("gif: palette must be (n≤256, 3) uint8")
    # color table size: power of two ≥ palette length, ≥ 2
    ct_bits = max(1, int(np.ceil(np.log2(max(pal.shape[0], 2)))))
    ct_size = 1 << ct_bits

    out = bytearray()
    out += b"GIF89a"
    # logical screen descriptor: global color table flag set, sort=0
    out += struct.pack("<HHBBB", w, h, 0x80 | ((ct_bits - 1) << 4) | (ct_bits - 1), 0, 0)
    out += pal.tobytes() + b"\0\0\0" * (ct_size - pal.shape[0])

    animated = len(frames) > 1
    if animated:
        # Netscape looping extension (loop forever)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    min_code = max(ct_bits, 2)
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("gif: all frames must share the canvas size")
        if animated or transparent_index is not None:
            flags = 0x04 if animated else 0  # disposal 1 (do not dispose)
            if transparent_index is not None:
                flags |= 0x01
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", flags, delay_cs if animated else 0, transparent_index or 0
            ) + b"\x00"
        # image descriptor at (0,0), full canvas
        idesc_flags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, idesc_flags)
        raster = _interlace(fr) if interlace else fr
        out.append(min_code)
        out += _write_sub_blocks(_lzw_compress(raster.reshape(-1), min_code))
    out += b"\x3b"  # trailer
    return bytes(out)


def decode_gif(payload: bytes, max_frames: int | None = None) -> list[np.ndarray]:
    """GIF bytes → list of (h, w, 3) uint8 RGB frames, composed onto the
    logical screen per each frame's disposal method. Raises ValueError on
    malformed input."""
    if payload[:6] not in GIF_SIGS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("gif: truncated header")
    w, h, flags, bg_idx, _ = struct.unpack_from("<HHBBB", payload, 6)
    idx = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(payload, dtype=np.uint8, count=n * 3, offset=idx).reshape(n, 3)
        idx += n * 3

    frames: list[np.ndarray] = []
    # current canvas (RGB) + the "previous" canvas for disposal 3
    if global_pal is not None and bg_idx < global_pal.shape[0]:
        canvas = np.tile(global_pal[bg_idx], (h, w, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((h, w, 3), dtype=np.uint8)
    transparent: int | None = None
    disposal = 0

    while idx < len(payload):
        block = payload[idx]
        idx += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if idx >= len(payload):
                raise ValueError("gif: truncated extension")
            label = payload[idx]
            idx += 1
            data, idx = _sub_blocks(payload, idx)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                gflags = data[0]
                disposal = (gflags >> 2) & 0x07
                transparent = data[3] if gflags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        # image descriptor
        if idx + 9 > len(payload):
            raise ValueError("gif: truncated image descriptor")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, idx)
        idx += 9
        pal = global_pal
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(payload, dtype=np.uint8, count=n * 3, offset=idx).reshape(n, 3)
            idx += n * 3
        if pal is None:
            raise ValueError("gif: image with no color table")
        if idx >= len(payload):
            raise ValueError("gif: truncated before LZW code size")
        min_code = payload[idx]
        idx += 1
        if not 2 <= min_code <= 8:
            raise ValueError("gif: bad LZW minimum code size")
        data, idx = _sub_blocks(payload, idx)
        raster = _lzw_decompress(data, min_code, iw * ih).reshape(ih, iw)
        if iflags & 0x40:
            raster = _deinterlace(raster)
        if np.any(raster >= pal.shape[0]):
            raise ValueError("gif: pixel index outside color table")

        saved = canvas.copy() if disposal == 3 else None
        region = canvas[iy : iy + ih, ix : ix + iw]
        if region.shape[:2] != (ih, iw):
            raise ValueError("gif: frame exceeds logical screen")
        rgb = pal[raster]
        if transparent is not None:
            keep = raster == transparent
            rgb = np.where(keep[..., None], region, rgb)
        canvas[iy : iy + ih, ix : ix + iw] = rgb
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            break
        # disposal AFTER the frame is shown
        if disposal == 2:  # restore to background
            if global_pal is not None and bg_idx < global_pal.shape[0]:
                canvas[iy : iy + ih, ix : ix + iw] = global_pal[bg_idx]
            else:
                canvas[iy : iy + ih, ix : ix + iw] = 0
        elif disposal == 3 and saved is not None:  # restore previous
            canvas = saved
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("gif: no image data")
    return frames


# =============================================================================
# JPEG (baseline sequential DCT, ITU T.81 + JFIF full-range color)
# =============================================================================

JPEG_SIG = b"\xff\xd8"

# Zig-zag index order (T.81 figure 5): ZIGZAG[k] = raster index of the k-th
# coefficient in transmission order.
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# T.81 Annex K.1 example quantization tables (the de-facto standard ones).
QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QTBL_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# T.81 Annex K.3 example Huffman tables: (bits[1..16], huffval).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis M: spatial = M.T @ coef @ M."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    m[0, :] *= 1 / np.sqrt(2)
    return m


_DCT_M = _dct_matrix()


def _canonical_codes(bits: list[int], huffval: list[int]):
    """T.81 Annex C code generation → {(length, code): symbol} and the
    encoder inverse {symbol: (code, length)}."""
    decode: dict[tuple[int, int], int] = {}
    encode: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = huffval[k]
            decode[(length, code)] = sym
            encode[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


class _BitReader:
    """MSB-first reader over de-stuffed entropy bytes."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("jpeg: entropy stream exhausted")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _decode_block(
    reader: _BitReader,
    dc_tbl: dict,
    ac_tbl: dict,
    qtbl: np.ndarray,
    pred: int,
) -> tuple[np.ndarray, int]:
    """One 8×8 block → (spatial uint8-range float array, new DC predictor)."""
    coef = np.zeros(64, dtype=np.float64)
    s = _decode_huff(reader, dc_tbl)
    diff = _extend(reader.bits(s), s) if s else 0
    pred += diff
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _decode_huff(reader, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg: AC run past end of block")
        coef[k] = _extend(reader.bits(s), s)
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[ZIGZAG] = coef * qtbl.reshape(-1)[ZIGZAG]
    block = block.reshape(8, 8)
    return _DCT_M.T @ block @ _DCT_M + 128.0, pred


def _split_scan(payload: bytes, idx: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from idx → de-stuffed segments split at RSTn,
    plus the index of the next marker (EOI or otherwise)."""
    segments: list[bytes] = []
    cur = bytearray()
    i = idx
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = payload[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # a real marker ends the scan
            break
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB (grayscale replicated).

    Supports: SOF0 8-bit, 1 or 3 components, sampling factors whose max is
    1 or 2 (4:4:4, 4:2:2, 4:2:0), DRI restart intervals, multiple
    DQT/DHT segments. Raises ValueError on progressive (SOF2) or
    arithmetic-coded input, and on any truncated/malformed stream.
    """
    try:
        return _decode_jpeg(payload)
    except (IndexError, KeyError, struct.error) as e:
        # truncated segments surface as short reads deep in the parser —
        # normalize to the contract the callers catch (ValueError)
        raise ValueError(f"jpeg: malformed stream ({type(e).__name__})") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != JPEG_SIG:
        raise ValueError("not a JPEG payload")
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None  # (h, w, components) where comp = (cid, hf, vf, tq)
    restart_interval = 0
    idx = 2
    n = len(payload)
    while idx < n:
        if payload[idx] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = payload[idx + 1]
        idx += 2
        if marker == 0xD8:
            continue
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if idx + 2 > n:
            raise ValueError("jpeg: truncated segment")
        seglen = struct.unpack_from(">H", payload, idx)[0]
        seg = payload[idx + 2 : idx + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: only 8-bit quant tables supported")
                vals = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p + 1).astype(np.int32)
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = vals
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                huffval = list(seg[p + 17 : p + 17 + cnt])
                dec, _ = _canonical_codes(bits, huffval)
                (dc_tables if tc == 0 else ac_tables)[th] = dec
                p += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = seg[0], struct.unpack_from(">H", seg, 1)[0], struct.unpack_from(">H", seg, 3)[0], seg[5]
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline sequential DCT is supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan_sel = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel.append((cs, tt >> 4, tt & 0x0F))
            segments, idx = _split_scan(payload, idx + seglen)
            return _decode_scan(frame, scan_sel, qtables, dc_tables, ac_tables,
                                segments, restart_interval)
        idx += seglen
    raise ValueError("jpeg: no scan data")


def _decode_scan(frame, scan_sel, qtables, dc_tables, ac_tables, segments,
                 restart_interval) -> np.ndarray:
    fh, fw, comps = frame
    by_id = {cid: (hf, vf, tq) for cid, hf, vf, tq in comps}
    hmax = max(hf for _, hf, _, _ in comps)
    vmax = max(vf for _, _, vf, _ in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))

    planes = {}
    for cid, hf, vf, tq in comps:
        planes[cid] = np.zeros((mcuy * vf * 8, mcux * hf * 8), dtype=np.float64)

    order = []  # (cid, hf, vf, qtbl, dc, ac) per scan component
    for cs, td, ta in scan_sel:
        hf, vf, tq = by_id[cs]
        order.append((cs, hf, vf, qtables[tq], dc_tables[td], ac_tables[ta]))

    preds = {cs: 0 for cs, _, _ in scan_sel}
    seg_i = 0
    reader = _BitReader(segments[seg_i])
    mcu_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_seg == restart_interval:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError("jpeg: missing restart segment")
                reader = _BitReader(segments[seg_i])
                preds = {cs: 0 for cs in preds}
                mcu_in_seg = 0
            for cid, hf, vf, qtbl, dct, act in order:
                for v in range(vf):
                    for h in range(hf):
                        block, preds[cid] = _decode_block(reader, dct, act, qtbl, preds[cid])
                        y0 = (my * vf + v) * 8
                        x0 = (mx * hf + h) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_in_seg += 1

    # upsample to full resolution and crop
    full = []
    for cid, hf, vf, tq in comps:
        p = planes[cid]
        if hf != hmax or vf != vmax:
            p = np.repeat(np.repeat(p, vmax // vf, axis=0), hmax // hf, axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# --- encoder (minimal baseline; used by tests as the decode differential) ----


class _BitWriter:
    __slots__ = ("out", "acc", "cnt")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.cnt = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.cnt += 1
            if self.cnt == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.cnt = 0

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3) — used before
        restart markers and at end of scan."""
        if self.cnt:
            self.acc <<= 8 - self.cnt
            self.acc |= (1 << (8 - self.cnt)) - 1
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.cnt = 0

    def marker(self, m: int) -> None:
        self.align()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _encode_block(writer: _BitWriter, block: np.ndarray, qtbl: np.ndarray,
                  dc_enc: dict, ac_enc: dict, pred: int) -> int:
    coef = _DCT_M @ (block - 128.0) @ _DCT_M.T
    q = np.round(coef / qtbl).astype(np.int64)
    zz = q.reshape(-1)[ZIGZAG]
    # DC
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    s = int(diff).bit_length() if diff != 0 else 0
    code, ln = dc_enc[s]
    writer.write(code, ln)
    if s:
        v = diff if diff > 0 else diff + (1 << s) - 1
        writer.write(v, s)
    # AC
    run = 0
    for k in range(1, 64):
        a = int(zz[k])
        if a == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            writer.write(code, ln)
            run -= 16
        s = abs(a).bit_length()
        code, ln = ac_enc[(run << 4) | s]
        writer.write(code, ln)
        v = a if a > 0 else a + (1 << s) - 1
        writer.write(v, s)
        run = 0
    if run:
        code, ln = ac_enc[0x00]
        writer.write(code, ln)
    return pred


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg formula; quality 1..100)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    out = (tbl * scale + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grayscale) → baseline JFIF bytes
    (Annex K tables, IJG quality scaling; ``subsample=True`` → 4:2:0, else
    4:4:4; ``restart_interval`` emits DRI + RSTn every that many MCUs)."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qy = _quality_scale(QTBL_LUMA, quality)
    qc = _quality_scale(QTBL_CHROMA, quality)

    if gray:
        y = arr.astype(np.float64)
        cb = cr = None
    else:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0

    _, dc_y_enc = _canonical_codes(*HUFF_DC_LUMA)
    _, ac_y_enc = _canonical_codes(*HUFF_AC_LUMA)
    _, dc_c_enc = _canonical_codes(*HUFF_DC_CHROMA)
    _, ac_c_enc = _canonical_codes(*HUFF_AC_CHROMA)

    if gray:
        hf, vf = 1, 1
        def pad(p, mult):
            ph = -(-p.shape[0] // mult) * mult
            pw = -(-p.shape[1] // mult) * mult
            return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        yp = pad(y, 8)
        cbs = crs = None
    elif subsample:
        hf, vf = 2, 2
        # pad to MCU multiple, box-average chroma 2×2
        def pad(p, mult):
            ph = -(-p.shape[0] // mult) * mult
            pw = -(-p.shape[1] // mult) * mult
            return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        yp = pad(y, 16)
        cbp, crp = pad(cb, 16), pad(cr, 16)
        cbs = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        crs = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        hf, vf = 1, 1
        def pad(p, mult):
            ph = -(-p.shape[0] // mult) * mult
            pw = -(-p.shape[1] // mult) * mult
            return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        yp = pad(y, 8)
        cbs, crs = pad(cb, 8), pad(cr, 8)

    out = bytearray()
    out += JPEG_SIG
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid, tbl):
        zz = np.empty(64, dtype=np.uint8)
        zz[:] = tbl.reshape(-1)[ZIGZAG]
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz.tobytes()

    nc = 1 if gray else 3
    out += dqt(0, qy)
    if not gray:
        out += dqt(1, qc)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    out += bytes([1, (hf << 4) | vf, 0])
    if not gray:
        out += bytes([2, 0x11, 1])
        out += bytes([3, 0x11, 1])

    def dht(tc, th, tbl):
        bits, huffval = tbl
        return (b"\xff\xc4" + struct.pack(">H", 19 + len(huffval))
                + bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval))

    out += dht(0, 0, HUFF_DC_LUMA) + dht(1, 0, HUFF_AC_LUMA)
    if not gray:
        out += dht(0, 1, HUFF_DC_CHROMA) + dht(1, 1, HUFF_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    out += bytes([1, 0x00])
    if not gray:
        out += bytes([2, 0x11, 3, 0x11])
    out += bytes([0, 63, 0])

    writer = _BitWriter()
    py = pc = pr = 0
    mcux = yp.shape[1] // (8 * hf)
    mcuy = yp.shape[0] // (8 * vf)
    mcu_in_seg = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_seg == restart_interval:
                writer.marker(0xD0 + rst)
                rst = (rst + 1) & 7
                py = pc = pr = 0
                mcu_in_seg = 0
            for v in range(vf):
                for hh in range(hf):
                    y0, x0 = (my * vf + v) * 8, (mx * hf + hh) * 8
                    py = _encode_block(writer, yp[y0:y0+8, x0:x0+8], qy, dc_y_enc, ac_y_enc, py)
            if not gray:
                y0, x0 = my * 8, mx * 8
                pc = _encode_block(writer, cbs[y0:y0+8, x0:x0+8], qc, dc_c_enc, ac_c_enc, pc)
                pr = _encode_block(writer, crs[y0:y0+8, x0:x0+8], qc, dc_c_enc, ac_c_enc, pr)
            mcu_in_seg += 1
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


# =============================================================================
# MP4/ISO-BMFF container metadata (ISO/IEC 14496-12 box structure)
# =============================================================================
#
# Frame DECODE for MP4 needs a video codec (H.264 etc.) this sandbox does
# not have — that stays honestly stubbed in multimodal.py. The container
# STRUCTURE, however, is a plain length-prefixed box tree, and a training
# pipeline wants duration/dimensions/track counts without decoding a single
# frame. Parsed from the public ISO base-media spec: `moov/mvhd` (timescale
# + duration), `moov/trak/tkhd` (track id, 16.16 fixed-point display size).

MP4_BRANDS = (b"isom", b"iso2", b"mp41", b"mp42", b"avc1", b"M4V ")

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def is_mp4(payload: bytes) -> bool:
    """True when the payload starts with an ftyp box (the MP4 signature)."""
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for sibling boxes in
    [start, end). Strict bounds: a box whose declared size escapes its
    parent raises ValueError (truncated/corrupt container)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("mp4: box size escapes its parent")
        yield typ, body, pos + size
        pos += size


def parse_mp4_metadata(payload: bytes) -> dict:
    """MP4 bytes → {brand, duration_ms, timescale, n_tracks, width, height}.

    width/height come from the first track whose tkhd carries a nonzero
    display size (video tracks; audio tracks store 0×0). Raises ValueError
    on non-MP4 or structurally corrupt input.
    """
    if not is_mp4(payload):
        raise ValueError("not an MP4/ISO-BMFF payload")
    brand = payload[8:12].decode("latin-1")
    duration_ms = None
    timescale = None
    n_tracks = 0
    width = height = None

    def visit(start: int, end: int) -> None:
        nonlocal duration_ms, timescale, n_tracks, width, height
        for typ, body, box_end in _walk_boxes(payload, start, end):
            if typ == b"mvhd":
                ver = payload[body]
                if ver == 1:  # 64-bit times
                    ts = int.from_bytes(payload[body + 20 : body + 24], "big")
                    dur = int.from_bytes(payload[body + 24 : body + 32], "big")
                else:
                    ts = int.from_bytes(payload[body + 12 : body + 16], "big")
                    dur = int.from_bytes(payload[body + 16 : body + 20], "big")
                timescale = ts
                duration_ms = int(dur * 1000 // ts) if ts else None
            elif typ == b"tkhd":
                n_tracks += 1
                ver = payload[body]
                # width/height are the LAST 8 bytes of the box, 16.16 fixed
                w = int.from_bytes(payload[box_end - 8 : box_end - 4], "big") >> 16
                h = int.from_bytes(payload[box_end - 4 : box_end], "big") >> 16
                if width is None and (w or h):
                    width, height = w, h
            elif typ in _MP4_CONTAINERS:
                visit(body, box_end)

    visit(0, len(payload))
    return {
        "brand": brand,
        "duration_ms": duration_ms,
        "timescale": timescale,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
    }


def _box(typ: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + typ + body


def build_mp4(
    duration_ms: int,
    width: int,
    height: int,
    timescale: int = 1000,
    n_audio_tracks: int = 0,
    mdat: bytes = b"",
) -> bytes:
    """Minimal valid ISO-BMFF file for tests/synthesis: ftyp +
    moov(mvhd + one video tkhd + optional 0×0 audio tkhds) + mdat.
    Deterministic bytes for deterministic inputs."""
    dur = duration_ms * timescale // 1000
    mvhd = _box(
        b"mvhd",
        b"\0\0\0\0"  # version 0 + flags
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + timescale.to_bytes(4, "big") + dur.to_bytes(4, "big")
        + b"\0" * 80,  # rate/volume/reserved/matrix/predefines/next_track_id
    )

    def tkhd(track_id: int, w: int, h: int) -> bytes:
        return _box(
            b"tkhd",
            b"\0\0\0\x07"
            + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
            + track_id.to_bytes(4, "big") + b"\0" * 4
            + dur.to_bytes(4, "big") + b"\0" * 8
            + b"\0" * 8  # layer/alternate/volume/reserved
            + b"\0" * 36  # matrix
            + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big"),
        )

    traks = [_box(b"trak", tkhd(1, width, height))]
    for i in range(n_audio_tracks):
        traks.append(_box(b"trak", tkhd(2 + i, 0, 0)))
    moov = _box(b"moov", mvhd + b"".join(traks))
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2mp41")
    return ftyp + moov + _box(b"mdat", mdat)
