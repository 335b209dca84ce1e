"""Streaming sidecar extraction: documents arriving as files -> sidecar rows.

The batch pipeline (operators/sidecar.py) is the semantic source of truth;
this module runs the SAME filter + detector stages over a file stream via
foreachBatch, with the digest dedup scoped per micro-batch plus a persistent
digest LEDGER as the cross-batch memo tier (the streaming analog of
DIGEST_CACHE, warc_metadata_sidecar.py:39,231-246): a batch row whose
payload_digest already exists in the ledger is SERVED from the stored
metadata — the detectors never run on it again. Matching the reference's
cache-fill rule (:270-276), only F4 survivors (rows where a detector fired)
are ledgered; ARC rows (null digest) are never cached (:226-228).

The crawl frontier itself intentionally stays ITERATIVE BATCH (SURVEY.md
§1.2): reproducible ordering needs deterministic rounds, which streaming
triggers do not give. Streaming applies to the extraction stage, which is
order-free (a pure per-payload function).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from warc_metadata_sidecar_spark import schema
from warc_metadata_sidecar_spark.operators.sidecar import base_filters, sidecar_rows

# metadata keyed by payload digest — exactly what DIGEST_CACHE memoizes
LEDGER = T.StructType(
    [T.StructField("payload_digest", T.StringType(), False)]
    + [f for f in schema.SIDECAR.fields if f.name in
       ("mime", "puid", "charset", "languages", "soft404", "payload")]
)


def _ledger_nonempty(ledger_dir: str) -> bool:
    return os.path.isdir(ledger_dir) and any(
        f.endswith(".parquet") for f in os.listdir(ledger_dir)
    )


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
        spark_l = batch_df.sparkSession
        new_docs = batch_df
        served = None
        if ledger_dir is not None and _ledger_nonempty(ledger_dir):
            known = spark_l.read.schema(LEDGER).parquet(ledger_dir)
            # serve known digests from stored metadata — detector-free path.
            # NULL digests (ARC) never equi-join, so they stay on the
            # detector path, matching the reference's never-cache-ARC rule.
            filtered = base_filters(batch_df)
            served = filtered.join(F.broadcast(known), "payload_digest", "inner").select(
                "doc_id",
                "url",
                "warc_date",
                F.when(F.col("is_arc"), F.lit(None).cast("string"))
                .otherwise(F.col("doc_id"))
                .alias("concurrent_id"),
                F.when(F.col("is_arc"), F.lit(None).cast("string"))
                .otherwise(F.col("warcinfo_id"))
                .alias("warcinfo_id"),
                "mime",
                "puid",
                "charset",
                "languages",
                "soft404",
                "payload",
            )
            new_docs = batch_df.join(
                known.select("payload_digest"), "payload_digest", "left_anti"
            )
        # detectors run exactly ONCE per batch: the checkpoint materializes
        # the fresh rows; both the sink write and the ledger fill read the
        # in-memory result instead of re-executing the Arrow stage
        fresh = sidecar_rows(new_docs, media)
        if ledger_dir is not None:
            fresh = fresh.localCheckpoint(eager=True)
        out = fresh.unionByName(served) if served is not None else fresh
        out.write.mode("append").parquet(output_dir)
        if ledger_dir is not None:
            # ledger-fill from the freshly detected rows only (all their
            # digests are new by construction of the anti-join above);
            # one row per digest, F4 survivors only (:270-276)
            additions = (
                fresh.join(
                    new_docs.select("doc_id", "payload_digest").filter(
                        F.col("payload_digest").isNotNull()
                    ),
                    "doc_id",
                    "inner",
                )
                .select(
                    "payload_digest", "mime", "puid", "charset",
                    "languages", "soft404", "payload",
                )
                .dropDuplicates(["payload_digest"])
            )
            additions.write.mode("append").parquet(ledger_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
