"""Training-loader batch planning — the step between curated shards and
the data loader: sequence-length bucketing (pad-efficient batches of
similar-length sequences) and token-balanced shard assignment (equal
WORK per shard, not equal row counts). Complements operators/packing.py
(which concatenates documents into fixed windows); bucketed batching is
the pad-and-batch alternative used when documents must stay intact.

Scale shapes:
  * length_bucket is a pure projection (floor-log2 class);
  * batch ids come from a ROW_NUMBER window PARTITIONED BY BUCKET — a
    per-bucket distributed sort that spills like any window, never a
    global single-partition sort (the scale-killer a naive global
    row_number would be); batches are deterministic (doc_id order);
  * balanced_shards round-robins each bucket's size-ranked rows across
    shards, so every shard receives an interleaved size profile and
    token sums stay within one max-document of each other per bucket —
    one window exchange on the bucket key, then the writer's hash
    exchange on shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def length_bucket_col(n_tokens: F.Column, base: int = 16) -> F.Column:
    """Floor-log2 length class: bucket k holds lengths in
    [base*2^k, base*2^(k+1)); lengths < base land in bucket 0."""
    return F.when(n_tokens < base, F.lit(0)).otherwise(
        F.floor(F.log2(n_tokens.cast("double") / base)).cast("int") + 1
    )


def plan_batches(
    docs: DataFrame,
    batch_size: int = 4,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    base: int = 16,
) -> DataFrame:
    """(doc_id, n_tokens, bucket, batch_id, pos): fixed-count batches of
    similar-length documents — batch_id is unique ACROSS buckets
    (bucket * 2^40 + per-bucket batch index; documents are bounded far
    below 2^40 batches per bucket), pos is the 0-based slot. Within a
    bucket, batches fill in (n_tokens, doc_id) order so padding waste is
    minimized (the longest member of a batch bounds its pad width)."""
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    ).withColumn("bucket", length_bucket_col(F.col("n_tokens"), base))
    w = Window.partitionBy("bucket").orderBy("n_tokens", "doc_id")
    rn = F.row_number().over(w) - 1
    return d.select(
        "doc_id",
        "n_tokens",
        "bucket",
        (
            F.col("bucket").cast("long") * F.lit(1 << 40)
            + F.floor(rn / batch_size)
        ).alias("batch_id"),
        (rn % batch_size).cast("int").alias("pos"),
    )


def balanced_shards(
    docs: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    base: int = 16,
) -> DataFrame:
    """(doc_id, n_tokens, bucket, shard): token-balanced shard
    assignment — within each length bucket, rows rank by (n_tokens desc,
    doc_id) and round-robin across shards, so per-shard token sums
    differ by at most one document per bucket (vs. hash sharding's
    unbounded skew on heavy-tailed lengths)."""
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    ).withColumn("bucket", length_bucket_col(F.col("n_tokens"), base))
    w = Window.partitionBy("bucket").orderBy(F.col("n_tokens").desc(), "doc_id")
    return d.select(
        "doc_id",
        "n_tokens",
        "bucket",
        ((F.row_number().over(w) - 1) % n_shards).cast("int").alias("shard"),
    )
