"""Streaming sidecar extraction: documents arriving as files -> sidecar rows.

The batch pipeline (operators/sidecar.py) is the semantic source of truth;
this module runs the SAME filter + detector stages over a file stream via
foreachBatch, with the digest dedup scoped per micro-batch plus a persistent
digest ledger joined as a second memo tier (the streaming analog of
DIGEST_CACHE: within-batch dedup is exact; across batches, previously
detected digests are served from the ledger instead of re-running
detectors).

The crawl frontier itself intentionally stays ITERATIVE BATCH (SURVEY.md
§1.2): reproducible ordering needs deterministic rounds, which streaming
triggers do not give. Streaming applies to the extraction stage, which is
order-free (a pure per-payload function).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark import schema
from warc_metadata_sidecar_spark.operators.sidecar import sidecar_rows


def start_sidecar_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    media: DataFrame | None = None,
    ledger_dir: str | None = None,
):
    """readStream(parquet documents) -> sidecar rows -> parquet sink.

    Returns the StreamingQuery. Use trigger availableNow semantics in tests
    via processAllAvailable().
    """
    stream = spark.readStream.schema(schema.DOCUMENTS).parquet(input_dir)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = sidecar_rows(batch_df, media)
        if ledger_dir is not None:
            spark_l = batch_df.sparkSession
            digests = (
                batch_df.select("payload_digest").filter(F.col("payload_digest").isNotNull()).distinct()
            )
            if os.path.isdir(ledger_dir) and any(
                f.endswith(".parquet") for f in os.listdir(ledger_dir)
            ):
                known = spark_l.read.parquet(ledger_dir)
                digests = digests.join(known, "payload_digest", "left_anti")
            digests.write.mode("append").parquet(ledger_dir)
        out.write.mode("append").parquet(output_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
