"""Hashed-bag-of-words linear classifier scoring — the fastText-shaped
quality-classifier stage a modern curation pipeline runs at corpus scale
(DCLM's fastText filter, RedPajama-v2's quality signals).

Model = a WEIGHT TABLE over hashed token buckets (+ bias): score(doc) =
sigmoid(bias + mean_{w in doc} weight[bucket(w)]) — fastText's linear
bag-of-features with mean pooling. Training happens offline (tiny model);
scoring at 100 TB is the Spark job, and it is shaped like this:

  explode words -> hash to bucket (pure expression)
    -> groupBy (doc_id, bucket) count        [map-side combinable:
       the shuffle carries per-doc DISTINCT buckets, not positions]
    -> broadcast-join the |buckets|-row weight table
    -> one weighted groupBy(doc_id) sum -> sigmoid

No UDFs, two map-side-combined aggregations, the model rides a broadcast.
The token hash is the md5-nibble bucket from operators/sampling.py, so
the DuckDB twin reproduces bucket assignment bit-for-bit; sigmoid is
exp-based and identical per-IEEE in both engines after 6-digit rounding.

Dual-dialect twin: driver_queries._Q["classifier_score"];
tests/test_classifier.py pins module == twin and the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark.operators.sampling import hash_bucket

N_FEATURE_BUCKETS = 256


def feature_bucket(word) -> "F.Column":
    """Token -> 0..255 feature id (md5 first-two-nibble bucket — engine-
    portable, collision-folding by construction like fastText's hashing
    trick)."""
    return F.conv(F.substring(F.md5(word), 1, 2), 16, 10).cast("int")


def score_documents(
    docs: DataFrame,
    weights: dict[int, float],
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_words, score): sigmoid(bias + mean hashed-bucket weight).
    Buckets absent from `weights` contribute 0.0 (an untrained feature —
    fastText's OOV behavior under the hashing trick is 'some bucket',
    here explicitly zero-weighted)."""
    spark = SparkSession.getActiveSession()
    wdf = spark.createDataFrame(
        [(int(k), float(v)) for k, v in sorted(weights.items())],
        "bucket int, w double",
    )
    words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).withColumn("bucket", feature_bucket(F.col("word")))
    per_bucket = words.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    scored = (
        per_bucket.join(F.broadcast(wdf), "bucket", "left")
        .withColumn("w", F.coalesce(F.col("w"), F.lit(0.0)))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("w")).alias("acc"),
        )
    )
    z = F.lit(float(bias)) + F.col("acc") / F.col("n_words")
    return scored.select(
        id_col,
        "n_words",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
    )
