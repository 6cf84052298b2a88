"""Spark-side GIF/JPEG multimodal paths: decode features, animated-GIF
frame sampling (the REAL video path), resize re-encode, and corrupt-payload
tolerance. The pure codec kernels are covered in test_imagecodecs.py; here
we assert the distributed plumbing produces the analytically expected
values end to end."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import multimodal as mm
from spider_spark.operators.imagecodecs import decode_gif, decode_jpeg


def _red_mean(w: int) -> float:
    return sum(x * 255 // max(w - 1, 1) for x in range(w)) / w / 255.0


def test_gif_decode_features_match_analytic(spark):
    feats = mm.extract_image_features(mm.generate_gif_images(spark, 24))
    rows = feats.select(
        "media_id", "width", "height",
        F.element_at("embedding", 1).cast("double").alias("red_mean"),
        F.element_at("embedding", 3).cast("double").alias("blue_mean"),
    ).collect()
    assert len(rows) == 24
    for r in rows:
        i = r.media_id
        w, h = 16 + i % 17, 12 + (i * 3) % 13
        assert (r.width, r.height) == (w, h)
        assert r.red_mean == pytest.approx(_red_mean(w), abs=1e-6)
        assert r.blue_mean == pytest.approx((i % 256) / 255.0, abs=1e-6)


def test_jpeg_flat_decode_is_exact(spark):
    feats = mm.extract_image_features(mm.generate_jpeg_images(spark, 24))
    rows = feats.select(
        "media_id",
        F.round(F.element_at("embedding", 1).cast("double") * 255, 0).alias("r"),
        F.round(F.element_at("embedding", 2).cast("double") * 255, 0).alias("g"),
        F.round(F.element_at("embedding", 3).cast("double") * 255, 0).alias("b"),
    ).collect()
    for r in rows:
        i = r.media_id
        assert (r.r, r.g, r.b) == ((i * 37) % 256, (i * 59) % 256, (i * 83) % 256)


def test_gif_video_frame_sampling_real_path(spark):
    media = mm.generate_gif_videos(spark, 10)
    frames = mm.sample_video_frames(media, frames_per_video=3)
    stats = mm.frame_stats(frames).collect()
    assert len(stats) == 30
    for s in stats:
        i, fi = s.media_id, s.frame_idx
        nf = 3 + i % 4
        f = min(fi * nf // 3, nf - 1)
        expect = ((i * 37 + f * 49) % 256, (f * 61) % 256, (i + f * 13) % 256)
        assert (s.mean_r, s.mean_g, s.mean_b) == expect
        assert (s.width, s.height) == (24 + i % 9, 18 + (i * 5) % 7)


def test_gif_video_sampling_more_frames_than_available(spark):
    media = mm.generate_gif_videos(spark, 3)
    frames = mm.sample_video_frames(media, frames_per_video=8).collect()
    # 8 sampled indices even though videos have only 3-6 frames (duplicates)
    assert {r.frame_idx for r in frames} == set(range(8))


def test_resize_gif_stays_gif_and_jpeg_stays_jpeg(spark):
    for gen, sig_check in (
        (mm.generate_gif_images, lambda b: bytes(b)[:6] in (b"GIF87a", b"GIF89a")),
        (mm.generate_jpeg_images, lambda b: bytes(b)[:2] == b"\xff\xd8"),
    ):
        out = mm.resize_images(gen(spark, 6), max_px=10).collect()
        assert len(out) == 6
        for r in out:
            assert max(r.width, r.height) <= 10
            assert sig_check(r.payload)


def test_resized_gif_decodes_to_nearest_neighbor_of_source(spark):
    out = {r.media_id: r for r in mm.resize_images(mm.generate_gif_images(spark, 4), max_px=8).collect()}
    src = {r.media_id: r for r in mm.generate_gif_images(spark, 4).collect()}
    for i, r in out.items():
        full = decode_gif(bytes(src[i].payload))[0]
        small = decode_gif(bytes(r.payload))[0]
        h, w = full.shape[:2]
        nh, nw = small.shape[:2]
        ys = (np.arange(nh) * h // nh)
        xs = (np.arange(nw) * w // nw)
        assert np.array_equal(small, full[np.ix_(ys, xs)])


def test_corrupt_gif_and_jpeg_yield_null_features_not_task_failure(spark):
    media = mm.generate_gif_images(spark, 4).union(mm.generate_jpeg_images(spark, 4))

    def corrupt(pdf_iter):
        for pdf in pdf_iter:
            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(lambda b: bytes(b)[: len(b) // 2])
            yield pdf

    broken = media.mapInPandas(corrupt, mm.MEDIA_SCHEMA)
    rows = mm.extract_image_features(broken).collect()
    assert len(rows) == 8
    assert all(r.width is None and r.embedding is None for r in rows)


def test_jpeg_mixed_quality_corpus_decodes(spark):
    """Non-oracle settings (q<100, 4:2:0, restarts) through the Spark path."""
    from spider_spark.operators.imagecodecs import encode_jpeg
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                yy, xx = np.mgrid[0:17, 0:23]
                arr = np.stack([xx * 11 % 256, yy * 13 % 256, np.full((17, 23), i % 256)], 2).astype(np.uint8)
                rows.append({
                    "media_id": i, "url": f"https://x.test/{i}", "kind": "image",
                    "content_type": "image/jpeg",
                    "payload": encode_jpeg(arr, quality=75 if i % 2 else 92,
                                           subsample=bool(i % 3 == 0),
                                           restart_interval=i % 4),
                    "meta_width": 23, "meta_height": 17, "meta_duration_ms": None,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in mm.MEDIA_SCHEMA.fields])

    media = spark.range(12).mapInPandas(gen, mm.MEDIA_SCHEMA)
    rows = mm.extract_image_features(media).collect()
    assert len(rows) == 12
    for r in rows:
        assert (r.width, r.height) == (23, 17)
        # blue plane is flat i%256: decoded mean must sit within JPEG loss
        expect = (r.media_id % 256) / 255.0
        assert abs(r.embedding[2] - expect) < 0.03
