"""SNK1: byte-form sidecar WARC export at the edge.

The reference writes gzipped WARC records via warcio.WARCWriter
(warc_metadata_sidecar.py:199-203,238-245,278-283). The engine's primary
sink is the columnar sidecar table; this module renders the byte form for
interop, one output WARC per source file via groupBy(source_file) +
applyInPandas (each group = the reference's unit of work, written by one
task).

Record bytes come from a built-in WARC/1.0 serializer (correct header
framing and Content-Length); gzip=True (default, like WARCWriter's
gzip=True) emits standard .warc.gz framing — each record its own gzip
member, which is what makes per-record random access possible and what
warcio/our ingest's multi-member gzip.decompress expects.
"""

from __future__ import annotations

import gzip as _gzip

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXPORT_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("sidecar_file", T.StringType()),
        T.StructField("n_records", T.IntegerType()),
        T.StructField("warc_bytes", T.BinaryType()),
    ]
)


def _render_record(row: pd.Series) -> bytes:
    payload = (row["payload"] or "").encode()
    headers = [
        ("WARC-Type", "metadata"),
        ("WARC-Record-ID", row["doc_id"]),
        ("WARC-Target-URI", row["url"]),
    ]
    if row.get("warc_date") is not None and not pd.isna(row.get("warc_date")):
        headers.append(("WARC-Date", pd.Timestamp(row["warc_date"]).strftime("%Y-%m-%dT%H:%M:%SZ")))
    # ARC-derived rows carry no Concurrent/Warcinfo IDs
    # (warc_metadata_sidecar.py:216-228)
    if row.get("concurrent_id"):
        headers.append(("WARC-Concurrent-To", row["concurrent_id"]))
    if row.get("warcinfo_id"):
        headers.append(("WARC-Warcinfo-ID", row["warcinfo_id"]))
    headers.append(("Content-Length", str(len(payload))))
    head = "WARC/1.0\r\n" + "".join(f"{k}: {v}\r\n" for k, v in headers)
    return head.encode() + b"\r\n" + payload + b"\r\n\r\n"


def export_sidecar_warcs(sidecar_with_source: DataFrame, gzip: bool = True) -> DataFrame:
    """sidecar rows (+ source_file column) -> one rendered WARC blob per
    source file: (source_file, sidecar_file, n_records, warc_bytes).
    gzip=True (reference default) writes one gzip member per record —
    deterministic (mtime=0) so exports are byte-reproducible."""
    from warc_metadata_sidecar_spark.operators.cdxj import sidecar_filename

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["warc_date", "doc_id"])
        if gzip:
            blob = b"".join(
                _gzip.compress(_render_record(r), mtime=0) for _, r in pdf.iterrows()
            )
        else:
            blob = b"".join(_render_record(r) for _, r in pdf.iterrows())
        src = pdf["source_file"].iloc[0]
        return pd.DataFrame(
            {
                "source_file": [src],
                "sidecar_file": [sidecar_filename(src)],
                "n_records": [len(pdf)],
                "warc_bytes": [blob],
            }
        )

    return sidecar_with_source.groupBy("source_file").applyInPandas(render, EXPORT_SCHEMA)


def write_sidecar_warc_files(exported: DataFrame, out_dir: str) -> None:
    """SNK1 file sink: one <name>.warc.meta.gz per source file, written by
    the executor that holds the blob (foreachPartition — no driver funnel).
    `exported` is export_sidecar_warcs output; out_dir must be a filesystem
    visible to executors (true for local mode and any shared FS).

    Collision guard: the reference's rename rule maps BOTH foo.arc.gz and
    foo.warc.gz to foo.warc.meta.gz (it processes one file per run, so it
    never notices); a batch writer must not let the second blob silently
    overwrite the first, so colliding names fall back to
    '<source_file>.meta.gz' verbatim."""
    import os

    from pyspark.sql import Window

    os.makedirs(out_dir, exist_ok=True)
    n_dupes = F.count("*").over(Window.partitionBy("sidecar_file"))
    named = exported.withColumn(
        "out_file",
        F.when(n_dupes > 1, F.concat(F.col("source_file"), F.lit(".meta.gz"))).otherwise(
            F.col("sidecar_file")
        ),
    )

    def write_part(rows):
        for r in rows:
            with open(os.path.join(out_dir, r.out_file), "wb") as fh:
                fh.write(bytes(r.warc_bytes))

    named.foreachPartition(write_part)
