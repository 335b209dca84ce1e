"""Audio fingerprinting (energy-delta bits) + Hamming-banded near-dup.

Reference anchor: the sidecar (warc_metadata_sidecar.py) never decodes
audio — it stops at mime/puid identification. This rides the real
WAV/FLAC decode stack (operators/multimodal.py:1062 decode_wav, :1251
decode_flac) with the audio near-dup a multimodal curation pipeline needs:
fingerprint every decodable clip in one mapInPandas scan, find duplicate /
near-duplicate pairs with the SAME band equi-join as image near-dup
(operators/phash.neardup_pairs) instead of an all-pairs comparison.

The fingerprint is a deterministic energy-delta code, an honest stand-in
for a spectral chromaprint (no FFT dependency, and — deliberately —
integer-exact so a DuckDB oracle can restate every bit from closed-form
PCM):

- samples are re-quantized to q = round(x * 32768): exact for 16-bit
  sources (the decoders emit dyadic s/2^15) and exact-by-construction for
  8-bit ((s-128)*256); mono = sum over channels (no division)
- the first 17*W frames (W = n_frames // 17) split into 17 windows of W;
  within a window, frames land in 4 stride bands by frame index i % 4
- E[w][b] = sum of mono^2 over band b of window w  (int64-exact)
- bit[w*4 + b] = E[w+1][b] > E[w][b]  — 16 transitions x 4 bands = 64
  bits, packed little-endian into four 16-bit band ints (same layout as
  operators/phash, so neardup_pairs is shared verbatim)

A lossless re-encode (WAV -> FLAC) fingerprints identically, so exact
duplicates are found ACROSS containers — the property digest-dedup
(operators/sidecar.py D1) cannot give, since the bytes differ.

Scale story (100 TB): one scan, 4 small ints per clip, no shuffle;
near-dup inherits phash's banded join — 16-bit x 4 shuffle keys, verify
on the 4-int vectors, pigeonhole-exact recall for max_hamming < 4.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from warc_metadata_sidecar_spark.operators.phash import N_BANDS, _pack_bands

N_WINDOWS = 17
N_STRIDE_BANDS = 4

FP_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("rate", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
    + [T.StructField(f"b{j}", T.LongType()) for j in range(N_BANDS)]
)


def fingerprint_pcm(x: np.ndarray) -> list[int] | None:
    """Four 16-bit band ints for a frames x channels float array in
    [-1, 1], or None when the clip is too short (< 17 frames)."""
    frames = x.shape[0]
    w = frames // N_WINDOWS
    if w == 0:
        return None
    q = np.rint(x * 32768.0).astype(np.int64)
    mono = q.sum(axis=1)[: w * N_WINDOWS]
    sq = mono * mono
    idx = (
        (np.arange(w * N_WINDOWS) // w) * N_STRIDE_BANDS
        + np.arange(w * N_WINDOWS) % N_STRIDE_BANDS
    )
    e = np.bincount(idx, weights=sq.astype(np.float64), minlength=N_WINDOWS * N_STRIDE_BANDS)
    e = e.astype(np.int64).reshape(N_WINDOWS, N_STRIDE_BANDS)
    bits = (e[1:] > e[:-1]).astype(np.int64)  # (16, 4) row-major = w*4 + b
    return _pack_bands(bits)


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """media (media_ref, bytes, ...) -> one fingerprint row per DECODABLE
    audio clip (WAV or FLAC); undecodable or too-short blobs keep a row
    with null bands."""
    from warc_metadata_sidecar_spark.operators.multimodal import (
        decode_flac,
        decode_wav,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_ref": list(pdf["media_ref"]),
                "rate": [],
                "n_frames": [],
                **{f"b{j}": [] for j in range(N_BANDS)},
            }
            for b in pdf["bytes"]:
                dec = None
                if b is not None:
                    raw = bytes(b)
                    dec = decode_wav(raw) or decode_flac(raw)
                bands = fingerprint_pcm(dec[2]) if dec is not None else None
                if bands is None:
                    for k in ("rate", "n_frames", *(f"b{j}" for j in range(N_BANDS))):
                        out[k].append(None)
                    continue
                out["rate"].append(dec[0])
                out["n_frames"].append(dec[2].shape[0])
                for j in range(N_BANDS):
                    out[f"b{j}"].append(bands[j])
            yield pd.DataFrame(out)

    return media.select("media_ref", "bytes").mapInPandas(batches, FP_SCHEMA)


MEDIA_HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
    ]
    + [T.StructField(f"d{j}", T.LongType()) for j in range(N_BANDS)]
)


def media_hashes(media: DataFrame) -> DataFrame:
    """ONE mapInPandas scan routing each blob to its fingerprint family:
    decodable image -> perceptual dHash bands (operators/phash), else
    decodable audio -> energy-delta bands, else a null row. Output
    (media_ref, kind: image|audio|null, d0..d3) feeds
    phash.media_dedup_keep PER KIND — image and audio bit layouts are
    unrelated, so cross-kind pairs must never form (the curate-media CLI
    partitions on kind before clustering)."""
    from warc_metadata_sidecar_spark.operators.multimodal import (
        decode_flac,
        decode_pixels,
        decode_wav,
    )
    from warc_metadata_sidecar_spark.operators.phash import hash_pixels

    def one(raw: bytes) -> tuple[str, list[int]] | None:
        img = decode_pixels(raw)
        if img is not None:
            return "image", hash_pixels(img[3])[0]
        dec = decode_wav(raw) or decode_flac(raw)
        if dec is not None:
            bands = fingerprint_pcm(dec[2])
            if bands is not None:
                return "audio", bands
        return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_ref": list(pdf["media_ref"]),
                "kind": [],
                **{f"d{j}": [] for j in range(N_BANDS)},
            }
            for b in pdf["bytes"]:
                res = one(bytes(b)) if b is not None else None
                if res is None:
                    out["kind"].append(None)
                    for j in range(N_BANDS):
                        out[f"d{j}"].append(None)
                    continue
                kind, bands = res
                out["kind"].append(kind)
                for j in range(N_BANDS):
                    out[f"d{j}"].append(bands[j])
            yield pd.DataFrame(out)

    return media.select("media_ref", "bytes").mapInPandas(batches, MEDIA_HASH_SCHEMA)


def audio_neardup_pairs(fingerprints: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate clip pairs: the shared banded equi-join over the
    fingerprint bands (see phash.neardup_pairs for the recall argument)."""
    from warc_metadata_sidecar_spark.operators.phash import neardup_pairs

    renamed = fingerprints.select(
        "media_ref", *[F.col(f"b{j}").alias(f"d{j}") for j in range(N_BANDS)]
    )
    return neardup_pairs(renamed, max_hamming=max_hamming)


RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("rate_in", T.LongType()),
        T.StructField("rate_out", T.LongType()),
        T.StructField("n_in", T.LongType()),
        T.StructField("n_out", T.LongType()),
        T.StructField("samples", T.ArrayType(T.LongType())),
    ]
)


def resample_audio(media: DataFrame, factor: int = 4) -> DataFrame:
    """Integer-factor audio decimation (the audio twin of
    phash.resize_images, completing the brief's decode / feature /
    resize / frame-sample quartet for the audio families): decode each
    blob via the real WAV/FLAC decoders, re-quantize to exact 16-bit
    integers (q = rint(x * 32768), lossless for both PCM widths), then
    box-mean each channel over `factor`-frame windows with FLOOR
    division — pure integer arithmetic, so the DuckDB oracle recomputes
    every output sample from the closed-form fixture PCM. The trailing
    partial window is dropped (n_out = n_in // factor); output samples
    are frame-major interleaved (frame j, channel c). Undecodable blobs
    keep a null-samples row. One mapInPandas scan over (media_ref,
    bytes) — blobs never shuffle, and at corpus scale this shares the
    decode pass with fingerprinting/feature extraction."""
    from warc_metadata_sidecar_spark.operators.multimodal import (
        decode_flac,
        decode_wav,
    )

    if factor < 1:
        raise ValueError("factor must be >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_ref": list(pdf["media_ref"]),
                "rate_in": [], "rate_out": [], "n_in": [], "n_out": [],
                "samples": [],
            }
            for b in pdf["bytes"]:
                dec = None
                if b is not None:
                    raw = bytes(b)
                    dec = decode_wav(raw) or decode_flac(raw)
                n_out = dec[2].shape[0] // factor if dec is not None else 0
                if dec is None or n_out == 0:
                    for k in ("rate_in", "rate_out", "n_in", "n_out", "samples"):
                        out[k].append(None)
                    continue
                rate, _, x = dec
                q = np.rint(x * 32768.0).astype(np.int64)
                trimmed = q[: n_out * factor]
                dec_q = (
                    trimmed.reshape(n_out, factor, q.shape[1]).sum(axis=1)
                    // factor  # numpy floor division, mirrored by the oracle
                )
                out["rate_in"].append(rate)
                out["rate_out"].append(rate // factor)
                out["n_in"].append(q.shape[0])
                out["n_out"].append(n_out)
                out["samples"].append([int(v) for v in dec_q.ravel()])
            yield pd.DataFrame(out)

    return media.select("media_ref", "bytes").mapInPandas(batches, RESAMPLE_SCHEMA)
