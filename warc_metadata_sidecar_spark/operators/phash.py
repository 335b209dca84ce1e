"""Perceptual image hashing (aHash / dHash) + Hamming-banded near-dup.

Reference anchor: warc_metadata_sidecar.py processes payload bytes only for
mime/charset/language metadata — it has no image-similarity notion. This
module extends the real-decode stack (operators/multimodal.py:1038
decode_pixels) with the image near-dup a training-data curation pipeline
needs at corpus scale: hash every decodable image in the same single
mapInPandas scan that decodes it, then find near-duplicate pairs with a
band equi-join instead of an all-pairs comparison.

Integer-exact by construction so a DuckDB oracle can replicate every bit
from the closed-form rasters (gen.phash_pixel):

- grayscale g = 299*R + 587*G + 114*B       (ITU-R 601 weights x1000 — no
  division, so box SUMS are exact int64)
- boxes: pixel (y, x) belongs to box (y*R//H, x*C//W) — floor binning
  handles non-divisible dims; box means are never materialized, every
  "mean(a) > mean(b)" is the cross-multiplied integer compare
  sum_a * n_b > sum_b * n_a
- dHash (64 bits): 9x8 grid, bit[r,c] = mean(r,c+1) > mean(r,c)
- aHash (64 bits): 8x8 grid, bit[r,c] = mean(box) > mean(image)
- bits packed little-endian into four 16-bit bands (i = r*8 + c; band
  j = i // 16 holds bit i at position i % 16) — band values are plain
  ints, safe to XOR on both Spark and DuckDB sides

Scale story (100 TB): hashing is one mapInPandas scan over blobs already
being decoded — 8 small ints per image, no shuffle. The near-dup join
explodes each image into 4 (band_idx, band_val) rows and equi-joins on
them: shuffle keys are 16-bit values x 4 indices (65536*4 buckets), skew
bounded by the hash's avalanche; verification touches only the 4-int hash
vectors, never pixels. For max_hamming < n_bands the candidate set is
EXACTLY the brute-force answer (pigeonhole: k < 4 differing bits leave
>= 1 band byte-equal), so recall is 1.0, not probabilistic.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

GRID = 8  # 8x8 bits = 64-bit hashes, packed as four 16-bit bands
N_BANDS = 4

HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("w", T.LongType()),
        T.StructField("h", T.LongType()),
    ]
    + [T.StructField(f"d{j}", T.LongType()) for j in range(N_BANDS)]
    + [T.StructField(f"a{j}", T.LongType()) for j in range(N_BANDS)]
)


def _box_sums(g: np.ndarray, rows: int, cols: int) -> tuple[np.ndarray, np.ndarray]:
    """(sums, counts) of the floor-binned rows x cols box partition of g.

    g is an int64 HxW grayscale plane; sums stay exact (max pixel value
    255_000, so a full-image sum fits in float64's 2^53 integer range with
    ~10^7 px headroom — bincount accumulates in float64, cast back)."""
    h, w = g.shape
    ybin = (np.arange(h) * rows) // h
    xbin = (np.arange(w) * cols) // w
    idx = (ybin[:, None] * cols + xbin[None, :]).ravel()
    sums = np.bincount(idx, weights=g.ravel(), minlength=rows * cols)
    counts = np.bincount(idx, minlength=rows * cols)
    return sums.astype(np.int64).reshape(rows, cols), counts.reshape(rows, cols)


def _pack_bands(bits: np.ndarray) -> list[int]:
    """64 bits (row-major, i = r*8 + c) -> four little-endian 16-bit ints."""
    flat = bits.ravel().astype(np.int64)
    shifts = 1 << (np.arange(64, dtype=np.int64) % 16)
    return [int((flat[j * 16 : (j + 1) * 16] * shifts[:16]).sum()) for j in range(N_BANDS)]


def hash_pixels(img: np.ndarray) -> tuple[list[int], list[int]]:
    """(dhash bands, ahash bands) for an HxWx3 uint8 RGB array."""
    g = (
        299 * img[:, :, 0].astype(np.int64)
        + 587 * img[:, :, 1].astype(np.int64)
        + 114 * img[:, :, 2].astype(np.int64)
    )
    s9, n9 = _box_sums(g, GRID, GRID + 1)
    dbits = s9[:, 1:] * n9[:, :-1] > s9[:, :-1] * n9[:, 1:]
    s8, n8 = _box_sums(g, GRID, GRID)
    total_s, total_n = int(s8.sum()), int(n8.sum())
    abits = s8 * total_n > total_s * n8
    return _pack_bands(dbits), _pack_bands(abits)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("src_w", T.LongType()),
        T.StructField("src_h", T.LongType()),
        T.StructField("out_w", T.LongType()),
        T.StructField("out_h", T.LongType()),
        T.StructField("pixels", T.ArrayType(T.LongType())),
    ]
)


def box_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Integer box-mean downsample of an HxWx3 uint8 array to
    out_h x out_w x 3: pixel (y, x) maps to box (y*out_h//H, x*out_w//W)
    (the floor binning shared with the hashes above); output value =
    box_sum // box_count — pure integer arithmetic, so a SQL oracle
    reproduces every output pixel from a closed-form raster."""
    h, w, _ = img.shape
    ybin = (np.arange(h) * out_h) // h
    xbin = (np.arange(w) * out_w) // w
    idx = ((ybin[:, None] * out_w + xbin[None, :]) * 3)[..., None] + np.arange(3)
    flat = idx.ravel()
    sums = np.bincount(flat, weights=img.astype(np.int64).ravel(), minlength=out_h * out_w * 3)
    counts = np.bincount(flat, minlength=out_h * out_w * 3)
    return (sums.astype(np.int64) // counts).reshape(out_h, out_w, 3)


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Thumbnail/resize stage of the multimodal pipeline (task brief:
    decode / feature-extract / RESIZE / frame-sample as pandas UDFs):
    decode each blob via the real decoders, box-mean downsample to
    out_w x out_h, return the flattened RGB pixel array (row-major,
    uint8 range) per image. Undecodable blobs keep a null-pixels row.
    One mapInPandas scan; at corpus scale this shares the decode pass
    with feature extraction and hashing."""
    from warc_metadata_sidecar_spark.operators.multimodal import decode_pixels

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_ref": list(pdf["media_ref"]),
                "src_w": [], "src_h": [], "out_w": [], "out_h": [], "pixels": [],
            }
            for b in pdf["bytes"]:
                dec = decode_pixels(bytes(b)) if b is not None else None
                if dec is None:
                    for k in ("src_w", "src_h", "out_w", "out_h", "pixels"):
                        out[k].append(None)
                    continue
                w, h, _, img = dec
                small = box_resize(img, out_w, out_h)
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["pixels"].append([int(v) for v in small.ravel()])
            yield pd.DataFrame(out)

    return media.select("media_ref", "bytes").mapInPandas(batches, RESIZE_SCHEMA)


def image_hashes(media: DataFrame) -> DataFrame:
    """media (media_ref, bytes, ...) -> one hash row per DECODABLE image.

    Runs in the same Arrow-batched mapInPandas shape as
    extract_media_features — at corpus scale the two share a scan.
    Undecodable blobs yield null hash columns (kept, not dropped: corrupt
    payloads are data at crawl scale and downstream counts want them)."""
    from warc_metadata_sidecar_spark.operators.multimodal import decode_pixels

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_ref": list(pdf["media_ref"]),
                "w": [],
                "h": [],
                **{f"d{j}": [] for j in range(N_BANDS)},
                **{f"a{j}": [] for j in range(N_BANDS)},
            }
            for b in pdf["bytes"]:
                dec = decode_pixels(bytes(b)) if b is not None else None
                if dec is None:
                    for k in ("w", "h", *(f"d{j}" for j in range(N_BANDS)), *(f"a{j}" for j in range(N_BANDS))):
                        out[k].append(None)
                    continue
                w, h, _, img = dec
                dband, aband = hash_pixels(img)
                out["w"].append(w)
                out["h"].append(h)
                for j in range(N_BANDS):
                    out[f"d{j}"].append(dband[j])
                    out[f"a{j}"].append(aband[j])
            yield pd.DataFrame(out)

    return media.select("media_ref", "bytes").mapInPandas(batches, HASH_SCHEMA)


def neardup_pairs(
    hashes: DataFrame, max_hamming: int = 3, max_bucket: int | None = None
) -> DataFrame:
    """Near-duplicate image pairs by dHash Hamming distance <= max_hamming.

    Band equi-join, not an all-pairs cross: each image explodes into
    N_BANDS (band_idx, band_val) rows carrying its 4 hash ints; a self
    equi-join on (band_idx, band_val) emits candidates, XOR popcount
    verifies. For max_hamming < N_BANDS this is EXACT (pigeonhole).
    Returns (ref_a, ref_b, hamming) with ref_a < ref_b, one row per pair.

    max_bucket (the LSH discipline from operators/dedup.py:89): a
    (band_idx, band_val) bucket with more members than this is a
    degenerate constant-region cluster (solid-color thumbnails, blank
    scans) whose within-bucket join is quadratic — drop it. At 10^10
    images the 65536-value bands average ~N/2^16 members per bucket, so
    uniform content stays cheap, but real corpora have such degenerate
    masses; the cap bounds worst-case work at the documented recall cost
    (None = exact, the oracle-pinned default)."""
    h = hashes.filter(F.col("d0").isNotNull()).select(
        "media_ref", *[f"d{j}" for j in range(N_BANDS)]
    )
    bands = h.select(
        "media_ref",
        *[f"d{j}" for j in range(N_BANDS)],
        F.posexplode(F.array(*[f"d{j}" for j in range(N_BANDS)])).alias(
            "band_idx", "band_val"
        ),
    )
    if max_bucket is not None:
        from pyspark.sql import Window

        sized = bands.withColumn(
            "bucket_n",
            F.count(F.lit(1)).over(Window.partitionBy("band_idx", "band_val")),
        )
        bands = sized.filter(F.col("bucket_n") <= max_bucket).drop("bucket_n")
    a, b = bands.alias("a"), bands.alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.d{j}").bitwiseXOR(F.col(f"b.d{j}")))
        for j in range(N_BANDS)
    )
    return (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.media_ref") < F.col("b.media_ref"),
            ],
        )
        .select(
            F.col("a.media_ref").alias("ref_a"),
            F.col("b.media_ref").alias("ref_b"),
            hamming.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["ref_a", "ref_b"])
    )


def media_dedup_keep(
    hashes: DataFrame, max_hamming: int = 3, max_bucket: int | None = None
) -> DataFrame:
    """Near-dup CLUSTERS with one kept representative per cluster:
    (media_ref, cluster_id, cluster_size, keep).

    Pairs alone over-delete: near-duplication chains (A~B, B~C with
    A!~C — e.g. a WAV, its FLAC re-encode, and a lightly-edited copy),
    so the pair set is first closed into components with the
    large-star/small-star rounds (operators/dedup.dup_clusters,
    cast=None — string refs order lexicographically). The keeper is the
    component's min ref (deterministic, partition-invariant); rows whose
    hash decoded but matched nobody are their own singleton keepers.
    Works on any 4-band hash table — image dHash or audio fingerprints
    renamed to d0..d3 (see afp.audio_neardup_pairs)."""
    from warc_metadata_sidecar_spark.operators.dedup import dup_clusters

    pairs = neardup_pairs(hashes, max_hamming=max_hamming, max_bucket=max_bucket)
    clusters = dup_clusters(pairs.select("ref_a", "ref_b"), cast=None)
    everyone = hashes.filter(F.col("d0").isNotNull()).select("media_ref")
    out = everyone.join(
        clusters.withColumnRenamed("doc_id", "media_ref"), "media_ref", "left"
    )
    return out.select(
        "media_ref",
        F.coalesce("cluster_id", "media_ref").alias("cluster_id"),
        F.coalesce("cluster_size", F.lit(1)).cast("long").alias("cluster_size"),
        (F.coalesce("cluster_id", "media_ref") == F.col("media_ref")).alias("keep"),
    )
