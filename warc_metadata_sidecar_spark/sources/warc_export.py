"""SNK1: byte-form sidecar WARC export at the edge.

The reference writes gzipped WARC records via warcio.WARCWriter
(warc_metadata_sidecar.py:199-203,238-245,278-283), warcinfo FIRST
(:199-203). The engine's primary sink is the columnar sidecar table; this
module renders the byte form for interop, one output WARC per source file
via groupBy(source_file) + applyInPandas (each group = the reference's unit
of work, written by one task).

Framing is byte-compatible with the reference golden
(tests/warc.warc.meta.gz, produced by warcio 1.7): CRLF headers in warcio's
order, `WARC-Concurrent-ID` (the reference's custom header name,
warc_metadata_sidecar.py:223 — not the standard Concurrent-To),
sha1/base32 WARC-Payload-Digest + WARC-Block-Digest computed over the
block, `Content-Type: application/warc-fields`, and `payload + CRLF CRLF`
record separation. Roundtrip equality against the golden is pinned in
tests/test_reference_fixtures.py. Deliberate diffs from the reference for
FRESH exports (both deterministic where the reference is not):
  - WARC-Record-ID / warcinfo record id: uuid5 of the record content
    (reference: random uuid4);
  - warcinfo WARC-Date: the max record date of the output file
    (reference: wall-clock now()).

gzip=True (default, like WARCWriter's gzip=True) emits one gzip member per
record with mtime=0 — deterministic, per-record random access, and what
warcio / our ingest's multi-member gzip.decompress expect.
"""

from __future__ import annotations

import base64
import gzip as _gzip
import hashlib
import uuid

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

_UUID_NS = uuid.NAMESPACE_URL


def _sha1_b32(block: bytes) -> str:
    return "sha1:" + base64.b32encode(hashlib.sha1(block).digest()).decode()


def _warc_ts(value) -> str:
    return pd.Timestamp(value).strftime("%Y-%m-%dT%H:%M:%SZ")


def _frame(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = "WARC/1.0\r\n" + "".join(f"{k}: {v}\r\n" for k, v in headers)
    return head.encode() + b"\r\n" + payload + b"\r\n\r\n"


def _render_record(row: pd.Series) -> bytes:
    """One metadata record, warcio header order (header dict first, then
    Type/Record-ID/URI/digests/Content-Type/Content-Length)."""
    payload = (row["payload"] or "").encode()
    digest = _sha1_b32(payload)
    headers: list[tuple[str, str]] = []
    if row.get("warc_date") is not None and not pd.isna(row.get("warc_date")):
        headers.append(("WARC-Date", _warc_ts(row["warc_date"])))
    # ARC-derived rows carry no Concurrent/Warcinfo IDs
    # (warc_metadata_sidecar.py:216-228)
    if row.get("concurrent_id"):
        headers.append(("WARC-Concurrent-ID", row["concurrent_id"]))
    if row.get("warcinfo_id"):
        headers.append(("WARC-Warcinfo-ID", row["warcinfo_id"]))
    # doc_id in the hash keeps ids unique when the same URL+payload appears
    # twice in one file (unchanged-page re-crawls)
    record_id = row.get("record_id") or (
        "<urn:uuid:%s>"
        % uuid.uuid5(
            _UUID_NS,
            "record:" + digest + (row.get("url") or "") + (row.get("doc_id") or ""),
        )
    )
    headers += [
        ("WARC-Type", "metadata"),
        ("WARC-Record-ID", record_id),
        ("WARC-Target-URI", row["url"]),
        ("WARC-Payload-Digest", digest),
        ("WARC-Block-Digest", digest),
        ("Content-Type", "application/warc-fields"),
        ("Content-Length", str(len(payload))),
    ]
    return _frame(headers, payload)


def render_warcinfo(
    filename: str,
    payload_fields: dict | None = None,
    record_id: str | None = None,
    warc_date=None,
    payload_text: str | None = None,
) -> bytes:
    """The per-file warcinfo record (create_warcinfo_record + payload,
    warc_metadata_sidecar.py:134-148,199-203). `payload_text` (CRLF-joined
    'k: v' lines, no trailing terminator) overrides `payload_fields` —
    the re-export path for parsed sidecars."""
    if payload_text is None:
        payload_fields = payload_fields or {}
        payload_text = "\r\n".join(f"{k}: {v}" for k, v in payload_fields.items())
    payload = payload_text.encode() + b"\r\n"
    record_id = record_id or (
        "<urn:uuid:%s>" % uuid.uuid5(_UUID_NS, "warcinfo:" + filename + payload_text)
    )
    if warc_date is None or pd.isna(warc_date):  # incl. pandas NaT
        warc_date = 0
    headers = [
        ("WARC-Type", "warcinfo"),
        ("WARC-Record-ID", record_id),
        ("WARC-Filename", filename),
        ("WARC-Date", _warc_ts(warc_date)),
        ("WARC-Block-Digest", _sha1_b32(payload)),
        ("Content-Type", "application/warc-fields"),
        ("Content-Length", str(len(payload))),
    ]
    return _frame(headers, payload)


def export_sidecar_warcs(
    sidecar_with_source: DataFrame,
    gzip: bool = True,
    operator: str | None = None,
    publisher: str | None = None,
    warcinfo: bool = True,
) -> DataFrame:
    """sidecar rows (+ source_file column) -> one rendered WARC blob per
    source file: (source_file, sidecar_file, n_records, warc_bytes), the
    warcinfo record FIRST like the reference (warc_metadata_sidecar.py:
    199-203). gzip=True (reference default) writes one gzip member per
    record — deterministic (mtime=0) so exports are byte-reproducible.

    BLOB-TABLE form: each task holds a whole file's members + the joined
    blob (~2.4x output size, measured) — fine at the WARC ~1 GB file
    convention for inspection/interop, but the FILE sink of choice is
    stream_sidecar_warc_files, which writes members incrementally at flat
    memory.

    Optional row columns override the synthesized warcinfo for re-export of
    parsed sidecars: winfo_payload (CRLF-joined field lines), winfo_id,
    winfo_date; and record_id pins a metadata record's WARC-Record-ID."""
    from warc_metadata_sidecar_spark.operators.cdxj import sidecar_filename
    from warc_metadata_sidecar_spark.sources.tables import warcinfo_provenance

    # provenance resolved ON THE DRIVER (SNK4: hostname/ip never from
    # executors); the per-file description is patched in inside the task
    prov_template = warcinfo_provenance("{name}", operator, publisher) if warcinfo else None

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["warc_date", "doc_id"])
        src = pdf["source_file"].iloc[0]
        name = sidecar_filename(src)
        blocks: list[bytes] = []
        if warcinfo:
            if "winfo_payload" in pdf.columns and pdf["winfo_payload"].iloc[0]:
                blocks.append(
                    render_warcinfo(
                        name,
                        payload_text=pdf["winfo_payload"].iloc[0],
                        record_id=pdf.get("winfo_id", pd.Series([None])).iloc[0],
                        warc_date=pdf.get("winfo_date", pd.Series([None])).iloc[0],
                    )
                )
            else:
                dates = pdf["warc_date"].dropna()
                fields = dict(prov_template)
                # single source of truth for the wording: format the
                # template's '{name}' placeholder
                fields["description"] = fields["description"].format(name=name)
                blocks.append(
                    render_warcinfo(
                        name,
                        payload_fields=fields,
                        warc_date=dates.max() if len(dates) else 0,
                    )
                )
        blocks += [_render_record(r) for _, r in pdf.iterrows()]
        if gzip:
            blob = b"".join(_gzip.compress(b, mtime=0) for b in blocks)
        else:
            blob = b"".join(blocks)
        return pd.DataFrame(
            {
                "source_file": [src],
                "sidecar_file": [name],
                "n_records": [len(pdf)],
                "warc_bytes": [blob],
            }
        )

    return sidecar_with_source.groupBy("source_file").applyInPandas(render, EXPORT_SCHEMA)


STREAM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("sidecar_file", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def stream_sidecar_warc_files(
    sidecar_with_source: DataFrame,
    out_dir: str,
    gzip: bool = True,
    operator: str | None = None,
    publisher: str | None = None,
    warcinfo: bool = True,
) -> list:
    """SNK1 streaming file sink (VERDICT r3 #8): gzip members are written
    to the output file AS ROWS STREAM THROUGH, never accumulated into a
    per-file blob. Peak memory per task is one Arrow batch
    (spark.sql.execution.arrow.maxRecordsPerBatch rows) plus ONE rendered
    record — measured (tracemalloc, 10k-row batches, ~1 KB payloads):
    FLAT ~1.7 MB above baseline whether the output file is 9, 17 or
    34 MB, vs the blob path's 21 / 42 / 83 MB (~2.4x output size: the
    member list plus the joined blob). Bytes are identical to
    export_sidecar_warcs + write_sidecar_warc_files (pinned by tests):
    same sort (warc_date asc nulls last, doc_id), same warcinfo-first
    framing, same collision fallback name.

    Rows of one source file are co-located (repartition on source_file)
    and sorted within the partition, so each task writes its files
    sequentially; out_dir must be executor-visible (local mode / shared
    FS). Returns the collected per-file stats rows
    (source_file, sidecar_file, n_records, n_bytes)."""
    import os

    from pyspark.sql import Window

    from warc_metadata_sidecar_spark.sources.tables import warcinfo_provenance

    prov_template = warcinfo_provenance("{name}", operator, publisher) if warcinfo else None
    os.makedirs(out_dir, exist_ok=True)

    # Per-file metadata (sidecar name, collision fallback, max date) comes
    # from a TINY one-row-per-file aggregate broadcast-joined back — NOT
    # from windows over the payload rows, which would add two full-data
    # exchanges (keyed on sidecar_file then source_file) on the sink whose
    # point is flat memory/IO. The only full-row shuffle left is the
    # repartition by source_file.
    from warc_metadata_sidecar_spark.operators.cdxj import (
        COLLISION_FALLBACK_SUFFIX,
        sidecar_filename_col,
    )

    per_file = (
        sidecar_with_source.groupBy("source_file")
        .agg(F.max("warc_date").alias("fmax_date"))
        .withColumn("sidecar_file", sidecar_filename_col(F.col("source_file")))
    )
    n_src = F.count("*").over(Window.partitionBy("sidecar_file"))
    per_file = per_file.withColumn(
        "out_file",
        F.when(
            n_src > 1, F.concat(F.col("source_file"), F.lit(COLLISION_FALLBACK_SUFFIX))
        ).otherwise(F.col("sidecar_file")),
    )
    # no broadcast hint: one row per source FILE is small at any sane file
    # count and the planner/AQE broadcasts it on its own; a forced hint
    # would be this round's rep-join bug class all over again
    prepared = (
        sidecar_with_source.join(per_file, "source_file")
        .repartition("source_file")
        .sortWithinPartitions(
            "source_file", F.asc_nulls_last("warc_date"), "doc_id"
        )
    )

    use_gzip = gzip

    def write_stream(batches):
        cur = None
        fh = None
        stats: list[dict] = []
        count = 0
        total = 0

        def close_current():
            nonlocal fh, count, total
            if fh is not None:
                fh.close()
                stats.append(
                    {
                        "source_file": cur,
                        "sidecar_file": cur_name,
                        "n_records": count,
                        "n_bytes": total,
                    }
                )
                fh, count, total = None, 0, 0

        cur_name = None
        for pdf in batches:
            # itertuples streams column arrays without materializing the
            # batch as one object ndarray (iterrows would); _asdict gives
            # _render_record its mapping interface
            for t in pdf.itertuples(index=False):
                row = t._asdict()
                if row["source_file"] != cur:
                    close_current()
                    cur = row["source_file"]
                    cur_name = row["sidecar_file"]
                    fh = open(os.path.join(out_dir, row["out_file"]), "wb")
                    if warcinfo:
                        if row.get("winfo_payload"):
                            info = render_warcinfo(
                                cur_name,
                                payload_text=row["winfo_payload"],
                                record_id=row.get("winfo_id"),
                                warc_date=row.get("winfo_date"),
                            )
                        else:
                            fields = dict(prov_template)
                            fields["description"] = fields["description"].format(
                                name=cur_name
                            )
                            max_date = row["fmax_date"]
                            info = render_warcinfo(
                                cur_name,
                                payload_fields=fields,
                                warc_date=0 if pd.isna(max_date) else max_date,
                            )
                        info = _gzip.compress(info, mtime=0) if use_gzip else info
                        fh.write(info)
                        total += len(info)
                block = _render_record(row)
                block = _gzip.compress(block, mtime=0) if use_gzip else block
                fh.write(block)
                count += 1
                total += len(block)
        close_current()
        if stats:
            yield pd.DataFrame(stats)

    return prepared.mapInPandas(write_stream, STREAM_STATS_SCHEMA).collect()


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

    from warc_metadata_sidecar_spark.operators.cdxj import COLLISION_FALLBACK_SUFFIX

    os.makedirs(out_dir, exist_ok=True)
    n_dupes = F.count("*").over(Window.partitionBy("sidecar_file"))
    named = exported.withColumn(
        "out_file",
        F.when(
            n_dupes > 1, F.concat(F.col("source_file"), F.lit(COLLISION_FALLBACK_SUFFIX))
        ).otherwise(F.col("sidecar_file")),
    )

    def write_part(rows):
        for r in rows:
            with open(os.path.join(out_dir, r.out_file), "wb") as fh:
                fh.write(bytes(r.warc_bytes))

    named.foreachPartition(write_part)


WET_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("wet_file", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("text_bytes", T.LongType()),
        T.StructField("warc_bytes", T.BinaryType()),
    ]
)


def wet_filename(warc_file: str) -> str:
    """crawl-x.warc.gz -> crawl-x.warc.wet.gz (the Common Crawl WET
    derivative naming convention, mirroring cdxj.sidecar_filename);
    ARC sources map the same way (crawl-x.arc.gz -> crawl-x.arc.wet.gz)."""
    import re as _re

    return _re.sub(r"\.(warc|arc)(\.gz)?$", r".\1.wet.gz", warc_file)


def export_wet(documents: DataFrame, gzip: bool = True) -> DataFrame:
    """WET-style extracted-text export: one gzipped WARC of `conversion`
    records per source file — the Common Crawl WET derivative shape, the
    text handoff format for training-data pipelines downstream of the
    sidecar. The reference emits metadata records only
    (warc_metadata_sidecar.py:238-245); this extends the same SNK1
    framing machinery (_frame/_sha1_b32/render_warcinfo, warcio-exact
    byte layout, deterministic uuid5 ids, mtime=0 gzip members) with the
    conversion record type.

    Per document: text = its text-kind spans concatenated in offset
    order (the span-sequence invariant); only `response` records with
    nonempty text convert (the WET rule — dns/revisit/empty rows have no
    extracted text). Headers: WARC-Type conversion, WARC-Refers-To =
    the source record's doc_id, Content-Type text/plain.

    Scale shape: same one-file-per-task groupBy(source_file) +
    applyInPandas as export_sidecar_warcs — the TEXT (not raw payload)
    is projected before the shuffle."""
    # array_sort on the raw span struct would order by its FIRST field
    # (kind); project to (offset, text) so the sort key is the offset —
    # the span-sequence order invariant
    pairs = F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")),
        lambda s: F.struct(
            s["offset"].alias("o"), F.coalesce(s["text"], F.lit("")).alias("t")
        ),
    )
    txt = F.array_join(F.transform(F.array_sort(pairs), lambda p: p["t"]), "")
    rows = (
        documents.filter(F.col("rec_type") == "response")
        .select(
            "source_file",
            "doc_id",
            "url",
            "warc_date",
            txt.alias("text"),
        )
        .filter(F.length("text") > 0)
    )

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["warc_date", "doc_id"])
        src = pdf["source_file"].iloc[0]
        name = wet_filename(src)
        dates = pdf["warc_date"].dropna()
        blocks = [
            render_warcinfo(
                name,
                payload_fields={
                    "software": "warc-metadata-sidecar-spark",
                    "format": "WARC File Format 1.0",
                    "description": f"Extracted-text conversion records for {src}",
                },
                warc_date=dates.max() if len(dates) else 0,
            )
        ]
        text_bytes = 0
        for _, r in pdf.iterrows():
            payload = (r["text"] or "").encode()
            text_bytes += len(payload)
            digest = _sha1_b32(payload)
            record_id = "<urn:uuid:%s>" % uuid.uuid5(
                _UUID_NS, "wet:" + digest + (r["url"] or "") + (r["doc_id"] or "")
            )
            headers = [
                ("WARC-Type", "conversion"),
                ("WARC-Record-ID", record_id),
                ("WARC-Refers-To", r["doc_id"]),
                ("WARC-Target-URI", r["url"]),
                ("WARC-Date", _warc_ts(r["warc_date"])),
                ("WARC-Block-Digest", digest),
                ("Content-Type", "text/plain"),
                ("Content-Length", str(len(payload))),
            ]
            blocks.append(_frame(headers, payload))
        if gzip:
            blob = b"".join(_gzip.compress(b, mtime=0) for b in blocks)
        else:
            blob = b"".join(blocks)
        return pd.DataFrame(
            {
                "source_file": [src],
                "wet_file": [name],
                "n_records": [len(pdf)],
                "text_bytes": [text_bytes],
                "warc_bytes": [blob],
            }
        )

    return rows.groupBy("source_file").applyInPandas(render, WET_SCHEMA)


def write_wet_files(exported: DataFrame, out_dir: str) -> None:
    """WET file sink: one <name>.wet.gz per source file, written by the
    executor that holds the blob (the write_sidecar_warc_files
    discipline; wet_filename's .warc/.arc split cannot collide, so no
    fallback rename is needed)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_part(rows):
        for r in rows:
            with open(os.path.join(out_dir, r.wet_file), "wb") as fh:
                fh.write(bytes(r.warc_bytes))

    exported.select("wet_file", "warc_bytes").foreachPartition(write_part)
