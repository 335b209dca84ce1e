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

Ledger scale shape (VERDICT r2 #5 — the r2 version forced a broadcast of an
unboundedly growing ledger and re-listed the whole directory per batch):
  - the ledger is a digest-BUCKETED table (Iceberg bucket(payload_digest)
    in production): the serve join and the anti-join co-locate on the
    ledger side with no exchange of the (big) ledger;
  - no broadcast hint — AQE broadcasts a small ledger at runtime and keeps
    the co-located join once it outgrows the threshold;
  - appends are O(batch); a file-count-triggered COMPACTION rewrites one
    row per digest when appends fragment the table (Iceberg:
    rewrite_data_files).

The crawl frontier itself intentionally stays ITERATIVE BATCH (SURVEY.md
§1.2): reproducible ordering needs deterministic rounds, which streaming
triggers do not give. Streaming applies to the extraction stage, which is
order-free (a pure per-payload function).
"""

from __future__ import annotations

import hashlib
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

LEDGER_BUCKETS = 16
LEDGER_COMPACT_FILES = 64


def _ledger_table_name(ledger_dir: str) -> str:
    return "sidecar_ledger_" + hashlib.md5(
        os.path.abspath(ledger_dir).encode()
    ).hexdigest()[:12]


def _ledger_files(ledger_dir: str) -> int:
    if not os.path.isdir(ledger_dir):
        return 0
    return sum(1 for f in os.listdir(ledger_dir) if f.endswith(".parquet"))


def _write_ledger(df: DataFrame, ledger_dir: str, mode: str) -> str:
    tbl = _ledger_table_name(ledger_dir)
    (
        df.write.mode(mode)
        .option("path", ledger_dir)
        .bucketBy(LEDGER_BUCKETS, "payload_digest")
        .sortBy("payload_digest")
        .format("parquet")
        .saveAsTable(tbl)
    )
    return tbl


def ensure_ledger_table(spark: SparkSession, ledger_dir: str) -> str | None:
    """The ledger table handle, or None when no ledger exists yet. A session
    restart (files on disk, table missing from the in-memory catalog)
    rebuilds the bucketed table once — which doubles as a compaction."""
    if not _ledger_files(ledger_dir):
        return None
    tbl = _ledger_table_name(ledger_dir)
    if spark.catalog.tableExists(tbl):
        return tbl
    recovered = (
        spark.read.schema(LEDGER)
        .parquet(ledger_dir)
        .dropDuplicates(["payload_digest"])
        .localCheckpoint(eager=True)
    )
    return _write_ledger(recovered, ledger_dir, "overwrite")


def split_by_ledger(
    batch_df: DataFrame, known: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(served, fresh_docs): batch rows whose digest is ledgered become
    sidecar rows straight from the stored metadata; the rest go to the
    detector path. Plain equi-joins on payload_digest — NO broadcast hint
    (the ledger grows without bound; over the bucketed layout the ledger
    side co-locates, and AQE may still broadcast while it is small). NULL
    digests (ARC) never equi-join, so they stay on the detector path,
    matching the reference's never-cache-ARC rule."""
    filtered = base_filters(batch_df)
    served = filtered.join(known, "payload_digest", "inner").select(
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
    fresh_docs = batch_df.join(
        known.select("payload_digest"), "payload_digest", "left_anti"
    )
    return served, fresh_docs


def compact_ledger(
    spark: SparkSession, ledger_dir: str, max_files: int = LEDGER_COMPACT_FILES
) -> bool:
    """Rewrite the ledger to one row per digest when per-batch appends have
    fragmented it past `max_files` parquet files. Returns True when a
    rewrite happened. The compacted frame is materialized first so the
    overwrite never reads under itself (Iceberg's rewrite_data_files commits
    a new snapshot instead)."""
    if _ledger_files(ledger_dir) <= max_files:
        return False
    tbl = ensure_ledger_table(spark, ledger_dir)
    if tbl is None:
        return False
    compacted = (
        spark.table(tbl).dropDuplicates(["payload_digest"]).localCheckpoint(eager=True)
    )
    _write_ledger(compacted, ledger_dir, "overwrite")
    return True


def start_sidecar_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    media: DataFrame | None = None,
    ledger_dir: str | None = None,
    compact_every_files: int = LEDGER_COMPACT_FILES,
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
        tbl = ensure_ledger_table(spark_l, ledger_dir) if ledger_dir else None
        if tbl is not None:
            served, new_docs = split_by_ledger(batch_df, spark_l.table(tbl))
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
            _write_ledger(additions, ledger_dir, "append" if tbl else "overwrite")
            compact_ledger(spark_l, ledger_dir, compact_every_files)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
