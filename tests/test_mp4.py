"""MP4/ISO-BMFF container metadata: the box-walk parser kernel
(`imagecodecs.parse_mp4_metadata` / `build_mp4`) and the distributed
`extract_video_metadata` path over mixed MP4 / animated-GIF / corrupt
payloads. Frame DECODE for MP4 stays honestly stubbed (no video codec in
the sandbox); the container structure — duration, display size, track
count — is real and what a training pipeline reads without touching a
single encoded frame."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import multimodal as mm
from spider_spark.operators.imagecodecs import (
    _box,
    build_mp4,
    is_mp4,
    parse_mp4_metadata,
)


# ---------------------------------------------------------------- kernel


def test_build_parse_roundtrip():
    for dur, w, h, na in [(1000, 320, 180, 0), (7340, 640, 360, 2), (59, 16, 9, 1)]:
        payload = build_mp4(dur, w, h, n_audio_tracks=na, mdat=b"x" * 32)
        assert is_mp4(payload)
        meta = parse_mp4_metadata(payload)
        assert meta["brand"] == "isom"
        assert meta["duration_ms"] == dur
        assert meta["timescale"] == 1000
        assert meta["n_tracks"] == 1 + na
        assert (meta["width"], meta["height"]) == (w, h)


def test_non_default_timescale_duration_math():
    # 90 kHz is the classic MPEG timescale; duration must convert exactly.
    payload = build_mp4(2500, 320, 240, timescale=90000)
    meta = parse_mp4_metadata(payload)
    assert meta["timescale"] == 90000
    assert meta["duration_ms"] == 2500


def test_is_mp4_rejects_non_mp4():
    assert not is_mp4(b"")
    assert not is_mp4(b"\x89PNG\r\n\x1a\n" + b"\0" * 16)
    assert not is_mp4(b"GIF89a" + b"\0" * 16)
    with pytest.raises(ValueError):
        parse_mp4_metadata(b"RIFF\0\0\0\0WAVEfmt ")


def test_truncated_and_escaping_boxes_raise():
    good = build_mp4(1000, 320, 180)
    # top-level box boundaries: a stream may legitimately END between
    # boxes (or with <8 trailing bytes); any cut INSIDE a declared box
    # size must raise, not loop or return garbage (a 100 TB crawl WILL
    # hit truncated containers)
    bounds, pos = [], 0
    while pos < len(good):
        bounds.append(pos)
        pos += int.from_bytes(good[pos : pos + 4], "big")
    ok_cut = {b + d for b in bounds + [len(good)] for d in range(8)}
    for cut in range(13, len(good) - 1, 7):
        prefix = good[:cut]
        if not is_mp4(prefix):
            continue
        try:
            parse_mp4_metadata(prefix)
            assert cut in ok_cut, f"cut {cut} inside a box parsed without error"
        except ValueError:
            assert cut not in ok_cut, f"cut {cut} at a box boundary raised"
    # declared child size escaping its parent raises
    bad_child = _box(b"moov", (64).to_bytes(4, "big") + b"mvhd" + b"\0" * 8)
    with pytest.raises(ValueError):
        parse_mp4_metadata(_box(b"ftyp", b"isom\0\0\0\0") + bad_child)


def test_largesize_and_to_end_boxes():
    inner = build_mp4(4321, 128, 96, n_audio_tracks=1)
    ftyp = inner[: int.from_bytes(inner[:4], "big")]
    rest = inner[len(ftyp):]
    moov_len = int.from_bytes(rest[:4], "big")
    moov_body = rest[8:moov_len]
    # 64-bit largesize moov
    large = (1).to_bytes(4, "big") + b"moov" + (16 + len(moov_body)).to_bytes(8, "big") + moov_body
    meta = parse_mp4_metadata(ftyp + large)
    assert meta["duration_ms"] == 4321 and meta["n_tracks"] == 2
    # size==0 ("to end of file") moov as the last box
    to_end = (0).to_bytes(4, "big") + b"moov" + moov_body
    meta2 = parse_mp4_metadata(ftyp + to_end)
    assert meta2["duration_ms"] == 4321
    # truncated largesize header raises
    with pytest.raises(ValueError):
        parse_mp4_metadata(ftyp + (1).to_bytes(4, "big") + b"moov" + b"\0\0")


def test_version1_mvhd_64bit_times():
    # hand-built v1 mvhd: 8-byte creation/modification, 4-byte timescale,
    # 8-byte duration (ISO 14496-12 §8.2.2)
    mvhd = _box(
        b"mvhd",
        b"\x01\0\0\0"
        + (0).to_bytes(8, "big") + (0).to_bytes(8, "big")
        + (600).to_bytes(4, "big") + (1800).to_bytes(8, "big")
        + b"\0" * 80,
    )
    payload = _box(b"ftyp", b"mp42\0\0\0\0") + _box(b"moov", mvhd)
    meta = parse_mp4_metadata(payload)
    assert meta["brand"] == "mp42"
    assert meta["timescale"] == 600
    assert meta["duration_ms"] == 3000
    assert meta["n_tracks"] == 0 and meta["width"] is None


def test_first_nonzero_tkhd_wins_even_after_audio_track():
    # audio (0x0) track listed BEFORE the video track: dimensions must
    # come from the first track with a nonzero display size
    full = build_mp4(1000, 320, 180, n_audio_tracks=1)
    meta = parse_mp4_metadata(full)
    assert (meta["width"], meta["height"]) == (320, 180)
    # rebuild with tracks swapped by hand
    dur = 1000
    def tkhd(track_id, w, h):
        return _box(
            b"tkhd",
            b"\0\0\0\x07" + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
            + track_id.to_bytes(4, "big") + b"\0" * 4 + dur.to_bytes(4, "big")
            + b"\0" * 8 + b"\0" * 8 + b"\0" * 36
            + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big"),
        )
    mvhd = _box(
        b"mvhd",
        b"\0\0\0\0" + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + (1000).to_bytes(4, "big") + dur.to_bytes(4, "big") + b"\0" * 80,
    )
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd(1, 0, 0)) + _box(b"trak", tkhd(2, 640, 480)))
    meta2 = parse_mp4_metadata(_box(b"ftyp", b"isom\0\0\0\0") + moov)
    assert meta2["n_tracks"] == 2
    assert (meta2["width"], meta2["height"]) == (640, 480)


# ---------------------------------------------------------- distributed


def test_generate_mp4_videos_metadata_matches_analytic(spark):
    media = mm.generate_mp4_videos(spark, 24)
    rows = mm.extract_video_metadata(media).orderBy("media_id").collect()
    assert len(rows) == 24
    for r in rows:
        i = r.media_id
        assert r.brand == "isom"
        assert r.duration_ms == 1000 + (i * 137) % 9000
        assert r.n_tracks == 1 + i % 3
        assert (r.width, r.height) == (320 + (i % 8) * 80, 180 + (i % 8) * 45)


def test_extract_video_metadata_gif_branch(spark):
    media = mm.generate_gif_videos(spark, 12)
    rows = mm.extract_video_metadata(media).orderBy("media_id").collect()
    assert len(rows) == 12
    for r in rows:
        i = r.media_id
        assert r.brand == "GIF89a"
        assert r.duration_ms == (3 + i % 4) * 40  # 40 ms/frame synthesis contract
        assert r.n_tracks == 1
        assert (r.width, r.height) == (24 + i % 9, 18 + (i * 5) % 7)


def test_corrupt_video_yields_null_row_not_task_failure(spark):
    good = mm.generate_mp4_videos(spark, 4)
    corrupt = good.limit(2).withColumn(
        "payload", F.expr("substring(payload, 1, 40)")  # cut inside moov
    ).withColumn("media_id", F.col("media_id") + 100)
    unknown = good.limit(1).withColumn(
        "payload", F.lit(b"\x00" * 64)
    ).withColumn("media_id", F.lit(200).cast("long"))
    out = mm.extract_video_metadata(good.unionByName(corrupt).unionByName(unknown))
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 7
    for mid in (100, 101, 200):
        r = rows[mid]
        assert r.brand is None and r.duration_ms is None and r.width is None
    assert rows[0].brand == "isom"


def test_extract_video_metadata_ignores_non_video_rows(spark):
    imgs = mm.generate_gif_images(spark, 6)  # kind == image
    vids = mm.generate_mp4_videos(spark, 3)
    out = mm.extract_video_metadata(imgs.unionByName(vids))
    assert out.count() == 3
