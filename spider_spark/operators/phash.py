"""Perceptual image hashing (difference hash) + banded near-duplicate
pairs — the image-side analog of SimHash text dedup: crawl image corpora
carry exact-duplicate *bytes* rarely but re-encoded / resized duplicates
constantly, and a 64-bit dHash catches those where content fingerprints
cannot.

The hash is computed from DECODED grayscale pixels (compose with the
repo's real codecs in ``operators/imagecodecs.py``), so — unlike most
image operators — every stage here is pure Catalyst arithmetic and the
whole pipeline is oracle-checkable in SQL.

Deterministic spec (dHash, Krawetz's 9×8 horizontal-gradient variant,
with NEAREST-NEIGHBOR sampling instead of box-average resize so two
engines agree exactly — documented divergence from implementations that
interpolate):

- sample a 9-wide × 8-tall grid: g(i,j) = pixels[ floor(j·H/8)·W +
  floor(i·W/9) ] for i∈[0,9), j∈[0,8) over row-major grayscale pixels;
- bit(i,j) = 1 iff g(i,j) > g(i+1,j) for i∈[0,8) — 8 bits per row;
- the hash is emitted as 8 per-row bytes (array<int>, each 0..255, MSB =
  i=0) — an int64 pack would overflow-trap in engines with checked
  BIGINT arithmetic, and the byte form is what banding wants anyway.

Shapes, 100 TB first: hashing is a map-only projection. Near-dup
candidate generation is the standard banding trick (SimHash §dedup.py
discipline): 8 single-byte bands — k differing bits can dirty at most k
bands, so any pair within Hamming distance ≤ 7 still shares a clean
band by pigeonhole — joined ids-only per band, deduped, then ONE exact
Hamming verify (zip_with + bit_count) per candidate pair. Shuffle ∝
band collisions, never images².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_COLS = 9
N_ROWS = 8


def col_dhash_bytes(pixels, width, height):
    """(pixels array<int> row-major grayscale, width, height) → array of
    8 row-bytes, or null when the image is smaller than the 9×8 grid."""
    px = pixels if not isinstance(pixels, str) else F.col(pixels)
    w = width if not isinstance(width, str) else F.col(width)
    h = height if not isinstance(height, str) else F.col(height)

    def g(i, j):
        # 1-based element_at; floor via integer division of longs
        idx = (j * h.cast("long") / N_ROWS).cast("long") * w.cast("long") + (
            i * w.cast("long") / N_COLS
        ).cast("long")
        return F.element_at(px, (idx + 1).cast("int"))

    def row_byte(j):
        b = F.lit(0)
        for i in range(N_COLS - 1):
            b = b + F.when(g(F.lit(i), F.lit(j)) > g(F.lit(i + 1), F.lit(j)),
                           F.lit(1 << (7 - i))).otherwise(F.lit(0))
        return b

    return F.when(
        (w >= N_COLS) & (h >= N_ROWS),
        F.array(*[row_byte(F.lit(j)) for j in range(N_ROWS)]),
    )


def dhash_images(
    images: DataFrame,
    id_col: str = "img_id",
    pixels_col: str = "pixels",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """Per-image dHash: (img_id, dh array<int>[8], dh_hex). Images
    smaller than the sampling grid yield null dh (report, don't guess)."""
    dh = col_dhash_bytes(pixels_col, width_col, height_col)
    return images.select(
        F.col(id_col).alias("img_id"),
        dh.alias("dh"),
        F.array_join(
            F.transform(dh, lambda b: F.lpad(F.hex(b), 2, "0")), ""
        ).alias("dh_hex"),
    )


def dhash_near_dups(
    images: DataFrame,
    max_dist: int = 4,
    id_col: str = "img_id",
    pixels_col: str = "pixels",
    width_col: str = "width",
    height_col: str = "height",
    max_band_size: int | None = 2000,
) -> DataFrame:
    """Banded near-duplicate image pairs: (id_a, id_b, hamming) with
    id_a < id_b and hamming ≤ max_dist. Guaranteed-complete for
    max_dist ≤ 7 (pigeonhole over the 8 byte-bands: ≤7 differing bits
    leave at least one band untouched); larger distances degrade to
    candidate recall like any banding scheme, so they are refused
    rather than silently incomplete.

    Hot-band guard: a crawl-scale image corpus is dense in near-uniform
    images (tracking pixels, placeholders, letterboxed frames) whose
    shared band bytes collapse into one (band, val) bucket, turning the
    candidate self-join quadratic. Bands with more than ``max_band_size``
    members are dropped via the same census + broadcast anti-join that
    guards MinHash/SimHash banding (``dedup._drop_hot_buckets``). A pair
    living ONLY in dropped bands is missed — such images are uniform/
    boilerplate content that exact byte-dedup already owns, the same
    recall argument as text LSH. Pass ``max_band_size=None`` for the
    unguarded banding-complete behavior (small corpora / oracle checks).
    Dropped-band accounting: ``dhash_hot_band_census`` reports what the
    guard removed — no silent caps."""
    if not 0 <= max_dist <= 7:
        raise ValueError("max_dist must be in [0, 7] (banding-complete range)")
    from .dedup import _drop_hot_buckets

    hashed = dhash_images(
        images, id_col, pixels_col, width_col, height_col
    ).where(F.col("dh").isNotNull())
    bands = hashed.select(
        "img_id",
        F.posexplode("dh").alias("band", "val"),
    )
    bands = _drop_hot_buckets(bands, ["band", "val"], max_band_size)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "val"])
        .where(F.col("x.img_id") < F.col("y.img_id"))
        .select(
            F.col("x.img_id").alias("id_a"), F.col("y.img_id").alias("id_b")
        )
        .distinct()
    )
    a = hashed.select(F.col("img_id").alias("id_a"), F.col("dh").alias("_dha"))
    b = hashed.select(F.col("img_id").alias("id_b"), F.col("dh").alias("_dhb"))
    ham = F.aggregate(
        F.zip_with(
            F.col("_dha"), F.col("_dhb"), lambda u, v: F.bit_count(u.bitwiseXOR(v))
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_dist)
    )


def dhash_hot_band_census(
    images: DataFrame,
    max_band_size: int = 2000,
    id_col: str = "img_id",
    pixels_col: str = "pixels",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """Accounting for the ``dhash_near_dups`` hot-band guard (the repo's
    no-silent-caps rule): per byte-band position, how many (band, val)
    buckets exceed ``max_band_size`` and how many band memberships the
    anti-join removes. One map-side-combinable census over the banding —
    the exact aggregation the guard itself computes, surfaced as a
    DataFrame so operators can log what a cap dropped. Output:
    (band, hot_buckets, dropped_memberships) for bands with any drop."""
    hashed = dhash_images(
        images, id_col, pixels_col, width_col, height_col
    ).where(F.col("dh").isNotNull())
    bucket_sizes = (
        hashed.select(F.posexplode("dh").alias("band", "val"))
        .groupBy("band", "val")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > max_band_size)
    )
    return (
        bucket_sizes.groupBy("band")
        .agg(
            F.count("*").alias("hot_buckets"),
            F.sum("_n").alias("dropped_memberships"),
        )
        .orderBy("band")
    )


def grayscale_from_ppm(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Codec-composition seam: decode netpbm P6 payloads with the repo's
    real parser (``multimodal.decode_ppm``) and emit the (img_id, width,
    height, pixels) frame ``dhash_images`` consumes. Grayscale is integer
    luma (r+g+b)//3 — exact on every engine, no float rounding. One
    Arrow-batched mapInPandas pass; images that fail to decode are
    dropped (the decode-error ledger lives with the codec operators)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from .multimodal import decode_ppm

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, pxs = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    arr = decode_ppm(bytes(payload))
                except Exception:
                    continue
                gray = (
                    arr[:, :, 0].astype(np.int64)
                    + arr[:, :, 1]
                    + arr[:, :, 2]
                ) // 3
                ids.append(int(i))
                hs.append(gray.shape[0])
                ws.append(gray.shape[1])
                pxs.append(gray.reshape(-1).astype("int32").tolist())
            yield pd.DataFrame(
                {"img_id": ids, "width": ws, "height": hs, "pixels": pxs}
            )

    return media.mapInPandas(
        run, "img_id long, width int, height int, pixels array<int>"
    )
