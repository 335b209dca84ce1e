"""Content-defined chunking (CDC) dedup for binary blobs — gear-hash
chunk boundaries + chunk-level dedup accounting, the storage-side
companion to the byte-digest (D1) and fingerprint (phash/afp) dedup
families: two media blobs that share a long byte run (same video with a
re-muxed header, same tarball with one member changed) dedup at the
CHUNK level even though whole-blob digests differ and the content isn't
decodable media.

Reference parity note: the reference memoizes whole-payload digests
(warc_metadata_sidecar.py:170-186, the D1 seam); CDC extends that to
sub-blob granularity the way commercial object stores and backup
systems (and Common-Crawl-scale WARC storage) do.

Algorithm (fully specified so the sequential twin can replay it):
  gear[b] = splitmix64(b + 1)  (the standard 64-bit mix, b = 0..255)
  h_0 = 0;  h_i = ((h_{i-1} << 1) + gear[data[i]]) mod 2^64
  a boundary closes the current chunk after byte i when the chunk has
  reached min_size and (h_i & mask) == 0, where mask = 2^mask_bits - 1
  (expected chunk ~ min_size + 2^mask_bits); a chunk also force-closes
  at max_size; h resets to 0 at every boundary. The final partial chunk
  always emits.

Scale shape (100 TB of blobs):
  * chunking is sequential PER BLOB (inherent to rolling hashes) — the
    blob is the parallel unit, one mapInPandas scan, no shuffle;
  * chunk identity is Spark's JVM-native md5 over the chunk bytes (the
    Python worker only finds boundaries; hashing stays codegen'd), and
    the bytes column drops BEFORE any aggregation, so the dedup
    accounting shuffles (md5, length) pairs only — never content;
  * the stats groupBy on chunk_md5 is map-side combinable; at corpus
    scale the chunk store would be the bucketed ledger pattern
    (streaming/ledger.py) keyed on md5 prefix.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


GEAR = [_splitmix64(b + 1) for b in range(256)]


def gear_boundaries(
    data: bytes, min_size: int = 32, mask_bits: int = 6, max_size: int = 512
) -> list[int]:
    """Chunk END offsets (exclusive) for `data` under the module's gear
    spec. Deterministic, content-defined: an insertion early in the blob
    shifts at most the chunks it touches."""
    mask = (1 << mask_bits) - 1
    out: list[int] = []
    h = 0
    start = 0
    for i, b in enumerate(data):
        h = ((h << 1) + GEAR[b]) & 0xFFFFFFFFFFFFFFFF
        size = i - start + 1
        if (size >= min_size and (h & mask) == 0) or size >= max_size:
            out.append(i + 1)
            start = i + 1
            h = 0
    if start < len(data):
        out.append(len(data))
    return out


CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("idx", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
        T.StructField("chunk", T.BinaryType()),
    ]
)


def cdc_chunks(
    media: DataFrame,
    min_size: int = 32,
    mask_bits: int = 6,
    max_size: int = 512,
) -> DataFrame:
    """(media_ref, bytes) -> one row per chunk: (media_ref, idx, offset,
    length, chunk_md5). Null/empty blobs yield no rows. Boundary finding
    runs in the Arrow-batched Python worker; the md5 is Spark-native
    (JVM) over the chunk bytes, which then drop from the frame."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, b in zip(pdf["media_ref"], pdf["bytes"]):
                if b is None:
                    continue
                raw = bytes(b)
                start = 0
                for idx, end in enumerate(
                    gear_boundaries(raw, min_size, mask_bits, max_size)
                ):
                    rows.append((ref, idx, start, end - start, raw[start:end]))
                    start = end
            yield pd.DataFrame(
                rows, columns=[f.name for f in CHUNK_SCHEMA.fields]
            )

    chunks = media.select("media_ref", "bytes").mapInPandas(batches, CHUNK_SCHEMA)
    return chunks.select(
        "media_ref", "idx", "offset", "length", F.md5("chunk").alias("chunk_md5")
    )


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Chunk table -> ONE accounting row: total vs distinct chunk counts
    and bytes, and the dedup ratio (stored/unique bytes, >= 1.0; whole-
    corpus). Distinct bytes count each chunk_md5's length once (same md5
    => same bytes; md5-collision risk is the standard CDC-store trade).
    Shuffles (md5, length) pairs only; both aggregations are map-side
    combinable."""
    per = chunks.groupBy("chunk_md5").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.max("length").alias("length"),
    )
    return per.agg(
        F.sum("n_copies").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("n_copies") * F.col("length")).cast("long").alias("bytes_total"),
        F.sum("length").cast("long").alias("bytes_distinct"),
        (
            F.sum(F.col("n_copies") * F.col("length"))
            / F.sum("length")
        ).alias("dedup_ratio"),
    )
