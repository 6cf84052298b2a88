"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

Codec status in this container (no Pillow/ffmpeg/torchaudio):

- **netpbm P6 images: REAL decode/encode/resize/features** (the format is
  a plain header + raw RGB bytes — parsed by hand, resized with numpy
  nearest-neighbor, features = channel means + 3×3 grid means),
- **WAV/PCM audio: REAL decode + features** via the stdlib ``wave``
  module (duration, RMS, zero-crossing rate, dominant frequency by FFT),
- JPEG/PNG/MP4: STUBBED — ``deterministic=True`` produces a seeded fake
  (stable bytes → stable features, good enough to test
  schema/partitioning/batching end-to-end); ``deterministic=False``
  raises NotImplementedError where the codec call belongs.

The Spark-side plumbing — schemas, batch iteration, partition sizing — is
identical for real and stubbed codecs and fully tested.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("url", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType()),
    ]
)


# --- REAL codecs (stdlib/numpy only) ---------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → netpbm P6 bytes."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """netpbm P6 bytes → (h, w, 3) uint8. Raises ValueError on non-P6."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 ppm payload")
    # header: magic, width, height, maxval — whitespace separated, then one
    # whitespace byte before raw RGB data
    parts, idx, token = [], 2, b""
    while len(parts) < 3:
        c = payload[idx : idx + 1]
        if c == b"":  # truncated header: fail, don't spin
            raise ValueError("truncated ppm header")
        idx += 1
        if c.isspace():
            if token:
                parts.append(int(token))
                token = b""
        elif c == b"#":  # comment to EOL
            while payload[idx : idx + 1] not in (b"\n", b""):
                idx += 1
        else:
            token += c
    w, h, maxval = parts
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=idx)
    return data.reshape(h, w, 3)


def ppm_features(arr: np.ndarray, grid: int = 3) -> np.ndarray:
    """Real image features: 3 channel means + grid×grid luminance means,
    all /255 — deterministic, codec-true."""
    lum = arr.mean(axis=2)
    h, w = lum.shape
    cells = [
        lum[h * i // grid : h * (i + 1) // grid or 1, w * j // grid : w * (j + 1) // grid or 1].mean()
        for i in range(grid)
        for j in range(grid)
    ]
    return (np.concatenate([arr.reshape(-1, 3).mean(axis=0), np.array(cells)]) / 255.0).astype(
        np.float32
    )


def resize_nearest(arr: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resize in pure numpy."""
    h, w, _ = arr.shape
    yi = (np.arange(new_h) * h // max(new_h, 1)).clip(0, h - 1)
    xi = (np.arange(new_w) * w // max(new_w, 1)).clip(0, w - 1)
    return arr[yi][:, xi]


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 mono samples, frame rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wv:
        rate = wv.getframerate()
        data = np.frombuffer(wv.readframes(wv.getnframes()), dtype="<i2")
        if wv.getnchannels() > 1:
            data = data.reshape(-1, wv.getnchannels()).mean(axis=1).astype("<i2")
    return data, rate


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic payload → feature vector (sha256-seeded); stands in for
    the real decoder so the distributed plumbing is testable."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    return np.random.RandomState(seed).standard_normal(out_dim).astype(np.float32)


def generate_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                payload = hashlib.sha256(f"media-{kind}-{i}".encode()).digest() * 4
                rows.append(
                    {
                        "media_id": int(i),
                        "url": f"https://cdn.crawl.test/{kind}/{i}",
                        "kind": kind,
                        "content_type": {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind],
                        "payload": payload,
                        "meta_width": 64 + int(i) % 512 if kind != "audio" else None,
                        "meta_height": 64 + (int(i) * 7) % 512 if kind != "audio" else None,
                        "meta_duration_ms": (1000 + int(i) * 33) if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def generate_ppm_images(spark, n: int) -> DataFrame:
    """Deterministic REAL images: netpbm P6 payloads (id-dependent size and
    gradient pattern) — the decode path below parses these for real."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                w, h = 16 + i % 17, 12 + (i * 3) % 13
                yy, xx = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [(xx * 255 // max(w - 1, 1)), (yy * 255 // max(h - 1, 1)),
                     np.full((h, w), i % 256)], axis=2
                ).astype(np.uint8)
                rows.append(
                    {
                        "media_id": i,
                        "url": f"https://cdn.crawl.test/ppm/{i}",
                        "kind": "image",
                        "content_type": "image/x-portable-pixmap",
                        "payload": encode_ppm(arr),
                        "meta_width": w,
                        "meta_height": h,
                        "meta_duration_ms": None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def generate_wav_audio(spark, n: int, rate: int = 16000, seconds: float = 0.25) -> DataFrame:
    """Deterministic REAL audio: WAV/PCM sine payloads (id-dependent
    frequency) — decodable with the stdlib wave module."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            t = np.arange(int(rate * seconds)) / rate
            for i in pdf["id"].to_numpy():
                i = int(i)
                freq = 200.0 + (i % 40) * 50.0
                samples = (np.sin(2 * np.pi * freq * t) * 12000).astype("<i2")
                rows.append(
                    {
                        "media_id": i,
                        "url": f"https://cdn.crawl.test/wav/{i}",
                        "kind": "audio",
                        "content_type": "audio/wav",
                        "payload": encode_wav(samples, rate),
                        "meta_width": None,
                        "meta_height": None,
                        "meta_duration_ms": int(seconds * 1000),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def extract_image_features(
    media: DataFrame, out_dim: int = 32, deterministic: bool = True
) -> DataFrame:
    """image binary → (width, height, embedding) via mapInPandas batches.

    P6/netpbm payloads take the REAL decode path (hand parser + channel/
    grid-mean features, padded/truncated to out_dim); other formats use the
    deterministic stub or raise where the codec call belongs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                if payload.startswith(b"P6"):
                    try:
                        arr = decode_ppm(payload)
                    except ValueError:
                        # corrupt/truncated image: null features, never a
                        # task failure (decode errors don't scale row-wise)
                        rows.append({"media_id": r["media_id"], "width": None,
                                     "height": None, "embedding": None})
                        continue
                    feats = ppm_features(arr)
                    emb = np.zeros(out_dim, dtype=np.float32)
                    emb[: min(out_dim, len(feats))] = feats[:out_dim]
                    w, h = arr.shape[1], arr.shape[0]
                elif not deterministic:
                    raise NotImplementedError(
                        "real decode for this format requires Pillow/torchvision — "
                        "not in this container; plug the codec call here"
                    )
                else:
                    emb = _fake_decode(payload, out_dim)
                    w, h = r["meta_width"], r["meta_height"]
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "width": w,
                        "height": h,
                        "embedding": emb.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return media.filter(F.col("kind") == "image").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("duration_ms", IntegerType()),
        StructField("rms", FloatType()),
        StructField("zero_crossing_rate", FloatType()),
        StructField("dominant_hz", FloatType()),
    ]
)


def extract_audio_features(media: DataFrame, deterministic: bool = True) -> DataFrame:
    """audio binary → (duration_ms, rms, zero-crossing rate, dominant
    frequency). WAV/PCM payloads (RIFF magic) take the REAL stdlib decode
    path; other formats stub or raise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                if payload.startswith(b"RIFF"):
                    samples, rate = decode_wav(payload)
                    x = samples.astype(np.float64)
                    rms = float(np.sqrt((x**2).mean())) if len(x) else 0.0
                    zcr = float((np.diff(np.signbit(x)).sum()) / max(len(x) - 1, 1))
                    spec = np.abs(np.fft.rfft(x))
                    dom = float(np.argmax(spec[1:]) + 1) * rate / len(x) if len(x) > 1 else 0.0
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "duration_ms": int(len(x) * 1000 / rate),
                            "rms": rms,
                            "zero_crossing_rate": zcr,
                            "dominant_hz": dom,
                        }
                    )
                elif not deterministic:
                    raise NotImplementedError(
                        "real decode for this format requires torchaudio/ffmpeg — "
                        "plug the codec call here"
                    )
                else:
                    seed = _fake_decode(payload, 4)
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "duration_ms": r["meta_duration_ms"],
                            "rms": abs(float(seed[0])) * 1000,
                            "zero_crossing_rate": abs(float(seed[1])) % 1.0,
                            "dominant_hz": abs(float(seed[2])) * 100,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return media.filter(F.col("kind") == "audio").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame, frames_per_video: int = 4, deterministic: bool = True
) -> DataFrame:
    """video binary → N sampled frame rows (row explosion inside the UDF —
    batch shape changes, which is why this is mapInPandas, not a UDF col)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg/decord — plug the codec call here"
                )
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                for fi in range(frames_per_video):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": fi,
                            "frame": hashlib.sha256(payload + fi.to_bytes(4, "big")).digest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return media.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def resize_images(media: DataFrame, max_px: int = 256, deterministic: bool = True) -> DataFrame:
    """image binary → resized binary + new dims (stubbed resize keeps the
    payload, recomputes dims — real impl swaps in the codec)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                if payload.startswith(b"P6"):
                    # REAL resize: decode → nearest-neighbor → re-encode
                    arr = decode_ppm(payload)
                    h, w = arr.shape[0], arr.shape[1]
                    scale = min(1.0, max_px / max(w, h, 1))
                    nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                    out = resize_nearest(arr, nw, nh)
                    rows.append(
                        {"media_id": r["media_id"], "payload": encode_ppm(out), "width": nw, "height": nh}
                    )
                    continue
                if not deterministic:
                    raise NotImplementedError("real resize for this format requires Pillow — plug the codec call here")
                w = int(r["meta_width"] or 0)
                h = int(r["meta_height"] or 0)
                scale = min(1.0, max_px / max(w, h, 1))
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "payload": payload,
                        "width": int(w * scale),
                        "height": int(h * scale),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return media.filter(F.col("kind") == "image").mapInPandas(run, out_schema)
