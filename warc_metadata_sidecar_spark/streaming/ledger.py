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


_BUCKET_ID_RE = __import__("re").compile(r"_(\d{5})\.c\d+")


def _files_by_bucket(d: str) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    if not os.path.isdir(d):
        return out
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            m = _BUCKET_ID_RE.search(f)
            if m:
                out.setdefault(int(m.group(1)), []).append(f)
    return out


def _rm_with_crc(dirname: str, fname: str) -> None:
    os.remove(os.path.join(dirname, fname))
    crc = os.path.join(dirname, f".{fname}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def compact(
    spark: SparkSession,
    ledger_dir: str,
    kind: str,
    bucket_col: str,
    prefix: str,
    per_bucket_files: int = 4,
) -> bool:
    """Per-bucket size-tiered compaction for a streaming ledger table —
    the sidecar digest-ledger policy (sidecar_stream.compact_ledger,
    VERDICT r3 #4) generalized to any ledger kind. A bucket rewrites only
    when it is fragmented (> per_bucket_files data files) AND the rewrite
    is amortized (non-largest files together >= the largest, so every
    rewrite at least doubles the consolidated file — O(n log n) cumulative
    I/O; safety valve at 8x the file threshold). Untouched buckets' files
    stay byte-identical.

    Rewritten rows are dropDuplicates()'d over ALL columns. Unlike the
    sidecar ledger there is no crash-recovery dedup pass on restart —
    these ledgers are SET-MEMBERSHIP state (paragraph hashes, band
    membership, signatures), where a crash-mid-swap's duplicate rows are
    semantically harmless: anti-joins and distinct candidate pairs give
    the same answers (documented; the sidecar ledger's inner join could
    double-serve, hence its stricter machinery). Iceberg analog:
    rewrite_data_files with a bucket filter. Returns True when any bucket
    was rewritten."""
    import shutil

    d = table_dir(ledger_dir, kind)
    by_bucket = _files_by_bucket(d)
    frag: list[int] = []
    for b, fs in by_bucket.items():
        if len(fs) <= per_bucket_files:
            continue
        sizes = [os.path.getsize(os.path.join(d, f)) for f in fs]
        if sum(sizes) - max(sizes) >= max(sizes) or len(fs) > 8 * per_bucket_files:
            frag.append(b)
    if not frag:
        return False
    tbl = table_name(prefix, ledger_dir, kind)
    paths = [os.path.join(d, f) for b in frag for f in by_bucket[b]]
    merged = spark.read.parquet(*paths).dropDuplicates().localCheckpoint(eager=True)
    tmp_root = ledger_dir.rstrip("/") + f"__{kind}_compact_tmp"
    tmp_tbl = table_name(prefix, tmp_root, kind)
    spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
    shutil.rmtree(tmp_root, ignore_errors=True)
    write(merged, tmp_root, kind, bucket_col, "overwrite", prefix)
    tmp_d = table_dir(tmp_root, kind)
    try:
        # new files in FIRST, then delete originals: a crash mid-swap can
        # only leave duplicate rows (benign here), never lose rows
        for f in os.listdir(tmp_d):
            if f.endswith(".parquet") or (
                f.startswith(".") and f.endswith(".parquet.crc")
            ):
                os.replace(os.path.join(tmp_d, f), os.path.join(d, f))
        for b in frag:
            for f in by_bucket[b]:
                _rm_with_crc(d, f)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
        shutil.rmtree(tmp_root, ignore_errors=True)
        if spark.catalog.tableExists(tbl):
            spark.catalog.refreshTable(tbl)
    return True
