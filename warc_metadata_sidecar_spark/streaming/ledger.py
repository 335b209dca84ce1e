"""Bucketed-parquet ledger tables — the shared state machinery of the
streaming dedup forms (neardup_stream's band/sig index, paradedup_stream's
paragraph-hash set; sidecar_stream pioneered the discipline).

Contract:
  * state lives under `ledger_dir/<kind>/` as a bucketed, sorted parquet
    table registered in the session catalog under a deterministic name
    (prefix + kind + md5(abspath)) — a restart rebuilds the catalog entry
    from the files once;
  * every read goes through `ensure`, which REFRESHES the table first:
    inside foreachBatch, epoch N+1's `spark.table()` otherwise resolves
    the file listing cached at epoch N's read and misses the append
    (observed; the r6 foreachBatch table-cache pitfall);
  * the hot join key is the bucket column, so batch-vs-ledger equi-joins
    co-locate on the ledger side with no ledger shuffle.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

LEDGER_BUCKETS = 16


def table_name(prefix: str, ledger_dir: str, kind: str) -> str:
    return f"{prefix}_{kind}_" + hashlib.md5(
        os.path.abspath(ledger_dir).encode()
    ).hexdigest()[:12]


def table_dir(ledger_dir: str, kind: str) -> str:
    return os.path.join(ledger_dir, kind)


def _has_files(d: str) -> bool:
    return os.path.isdir(d) and any(f.endswith(".parquet") for f in os.listdir(d))


def write(
    df: DataFrame,
    ledger_dir: str,
    kind: str,
    bucket_col: str,
    mode: str,
    prefix: str,
    buckets: int = LEDGER_BUCKETS,
) -> str:
    tbl = table_name(prefix, ledger_dir, kind)
    (
        df.write.mode(mode)
        .option("path", table_dir(ledger_dir, kind))
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(tbl)
    )
    return tbl


def ensure(
    spark: SparkSession,
    ledger_dir: str,
    kind: str,
    bucket_col: str,
    prefix: str,
    buckets: int = LEDGER_BUCKETS,
):
    """The bucketed table handle, or None before the first append."""
    d = table_dir(ledger_dir, kind)
    if not _has_files(d):
        return None
    tbl = table_name(prefix, ledger_dir, kind)
    if spark.catalog.tableExists(tbl):
        spark.catalog.refreshTable(tbl)
        return spark.table(tbl)
    recovered = spark.read.parquet(d).localCheckpoint(eager=True)
    return spark.table(write(recovered, ledger_dir, kind, bucket_col, "overwrite", prefix, buckets))
