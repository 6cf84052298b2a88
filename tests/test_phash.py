"""Perceptual dHash + banded image near-dup (operators/phash.py)."""

from __future__ import annotations

import pytest

from spider_spark.operators import phash


def _brute_dhash(pixels, w, h):
    if w < 9 or h < 8:
        return None
    out = []
    for j in range(8):
        b = 0
        for i in range(8):
            g0 = pixels[(j * h // 8) * w + (i * w // 9)]
            g1 = pixels[(j * h // 8) * w + ((i + 1) * w // 9)]
            if g0 > g1:
                b |= 1 << (7 - i)
        out.append(b)
    return out


def _img_gradient(w, h, step):
    # horizontal gradient with a per-image step so hashes differ
    return [((x * step) % 256) for y in range(h) for x in range(w)]


def _images(spark, rows):
    return spark.createDataFrame(
        rows, "img_id long, width int, height int, pixels array<int>"
    )


def test_dhash_matches_bruteforce(spark):
    rows = []
    for i, (w, h, step) in enumerate([(9, 8, 7), (16, 16, 3), (40, 30, 11)]):
        rows.append((i, w, h, _img_gradient(w, h, step)))
    got = {
        r["img_id"]: (r["dh"], r["dh_hex"])
        for r in phash.dhash_images(_images(spark, rows)).collect()
    }
    for i, (_, w, h, px) in enumerate(rows):
        want = _brute_dhash(px, w, h)
        assert got[i][0] == want, i
        assert got[i][1] == "".join(f"{b:02X}" for b in want), i


def test_tiny_image_yields_null(spark):
    rows = [(0, 8, 8, [0] * 64), (1, 9, 7, [0] * 63)]
    got = {r["img_id"]: r["dh"] for r in phash.dhash_images(_images(spark, rows)).collect()}
    assert got == {0: None, 1: None}


def test_resized_duplicate_detected(spark):
    # same gradient content at two resolutions -> identical dHash
    # step 3 keeps sampled values monotonic (no %256 wrap) at both sizes,
    # so the two resolutions sample the same gradient structure
    rows = [
        (0, 18, 16, _img_gradient(18, 16, 3)),
        (1, 36, 32, _img_gradient(36, 32, 3)),  # not pixel-equal, same structure
        (2, 18, 16, _img_gradient(18, 16, 100)),  # wrapping content differs
    ]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash.dhash_near_dups(_images(spark, rows), max_dist=4).collect()
    }
    assert (0, 1) in pairs
    assert all(k == (0, 1) for k in pairs)


def test_hamming_exact_and_band_guarantee(spark):
    base = _img_gradient(27, 16, 5)
    # flip content in one sampled cell: change pixel at grid (i=3,j=2)
    tweaked = list(base)
    idx = (2 * 16 // 8) * 27 + (3 * 27 // 9)
    tweaked[idx] = 255
    rows = [(0, 27, 16, base), (1, 27, 16, tweaked)]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash.dhash_near_dups(_images(spark, rows), max_dist=4).collect()
    }
    a = _brute_dhash(base, 27, 16)
    b = _brute_dhash(tweaked, 27, 16)
    want = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
    if want <= 4:
        assert pairs[(0, 1)] == want
    else:
        assert (0, 1) not in pairs


def test_identical_images_distance_zero(spark):
    px = _img_gradient(20, 10, 13)
    rows = [(0, 20, 10, px), (1, 20, 10, list(px))]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash.dhash_near_dups(_images(spark, rows)).collect()
    }
    assert pairs == {(0, 1): 0}


def test_rejects_out_of_band_max_dist(spark):
    with pytest.raises(ValueError):
        phash.dhash_near_dups(_images(spark, []), max_dist=-1)
    with pytest.raises(ValueError):
        # beyond the 8-band pigeonhole guarantee: refused, not incomplete
        phash.dhash_near_dups(_images(spark, []), max_dist=8)


def _uniform_plus_pair(spark, n_uniform):
    """n_uniform all-zero 18x16 images (every band byte collapses to the
    same (band, 0) bucket) plus two gradient images forming one cold-band
    near-dup pair."""
    from pyspark.sql import functions as F

    uniform = spark.range(n_uniform).select(
        F.col("id").alias("img_id"),
        F.lit(18).alias("width"),
        F.lit(16).alias("height"),
        F.transform(F.sequence(F.lit(0), F.lit(287)), lambda p: F.lit(0)).alias(
            "pixels"
        ),
    )
    # DECREASING gradient: g(i) > g(i+1) everywhere, so every band byte
    # is 0xFF — disjoint from the uniform mass's (band, 0) hot buckets.
    px = [255 - x * 3 for _ in range(16) for x in range(18)]
    pair = _images(
        spark,
        [
            (n_uniform, 18, 16, px),
            (n_uniform + 1, 18, 16, list(px)),
        ],
    )
    return uniform.unionByName(pair)


def test_hot_band_guard_bounds_uniform_mass(spark):
    """10k near-uniform images (the tracking-pixel/placeholder scenario):
    unguarded banding would enqueue ~50M candidate pairs; the guard drops
    the 8 hot (band, 0) buckets so only the cold gradient pair survives.
    Completing at all — quickly, with one emitted pair — IS the assertion
    that candidates stayed bounded."""
    imgs = _uniform_plus_pair(spark, 10_000)
    got = phash.dhash_near_dups(imgs, max_dist=4, max_band_size=100).collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in got} == {
        (10_000, 10_001, 0)
    }


def test_hot_band_census_accounts_for_drops(spark):
    """No-silent-caps: the census reports exactly what the guard removed —
    each of the 8 band positions has one hot bucket (val=0) carrying all
    200 uniform memberships; the gradient pair's buckets stay cold."""
    imgs = _uniform_plus_pair(spark, 200)
    rows = phash.dhash_hot_band_census(imgs, max_band_size=100).collect()
    assert [r["band"] for r in rows] == list(range(8))
    assert all(r["hot_buckets"] == 1 for r in rows)
    assert all(r["dropped_memberships"] == 200 for r in rows)
    # below the cap: nothing to report
    assert phash.dhash_hot_band_census(imgs, max_band_size=1000).count() == 0


def test_guard_noop_below_cap(spark):
    """With every bucket under the cap the guarded result is identical to
    the unguarded (max_band_size=None) banding-complete result."""
    rows = [
        (i, 18, 16, _img_gradient(18, 16, s))
        for i, s in enumerate([3, 3, 7, 11, 100])
    ]
    unguarded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash.dhash_near_dups(
            _images(spark, rows), max_dist=4, max_band_size=None
        ).collect()
    }
    guarded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash.dhash_near_dups(
            _images(spark, rows), max_dist=4, max_band_size=50
        ).collect()
    }
    assert guarded == unguarded
    assert (0, 1, 0) in guarded


def test_real_codec_integration(spark):
    """PPM payloads decoded by the real parser -> grayscale -> dHash
    matches a numpy reference on the same decoded arrays."""
    import numpy as np

    from spider_spark.operators import multimodal as mm

    media = mm.generate_ppm_images(spark, 12)
    gray = phash.grayscale_from_ppm(media)
    got = {
        r["img_id"]: r["dh"]
        for r in phash.dhash_images(gray).collect()
    }
    raw = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for i, payload in raw.items():
        arr = mm.decode_ppm(payload)
        g = (
            arr[:, :, 0].astype(np.int64) + arr[:, :, 1] + arr[:, :, 2]
        ) // 3
        h, w = g.shape
        want = (
            _brute_dhash(g.reshape(-1).tolist(), w, h) if w >= 9 and h >= 8 else None
        )
        assert got[i] == want, i
