"""S9 (sidecar payload deserialization) and SNK1 (WARC byte export) tests."""

import json

from pyspark.sql import functions as F

from warc_metadata_sidecar_spark.operators.cdxj import parse_sidecar_payload
from warc_metadata_sidecar_spark.operators.sidecar import sidecar_rows
from warc_metadata_sidecar_spark.sources.warc_export import export_sidecar_warcs


PAYLOAD = (
    'Identified-Payload-Type: {"fido": "text/html", "python-magic": "text/html"}\n'
    "Preservation-Identifier: fmt/471\n"
    'Charset-Detected: {"encoding": "ascii", "confidence": 1.0}\n'
    'Languages-cld2: {"reliable": true, "text-bytes": 2048, "languages": '
    '[{"name": "ENGLISH", "code": "en", "text-covered": 90, "score": 1024.0}]}\n'
    "Soft-404-Detected: 0.025"
)


def test_parse_sidecar_payload_roundtrip(spark):
    # cf. convert_payload_to_json (sidecar2cdxj.py:18-29) and its test (:41-44)
    df = spark.createDataFrame([(PAYLOAD,)], ["payload"])
    row = parse_sidecar_payload(df).first()
    assert row.mime["fido"] == "text/html"
    assert row.puid == "fmt/471"
    assert row.charset.encoding == "ascii" and row.charset.confidence == 1.0
    assert row.languages.languages[0].code == "en"
    assert row.soft404 == 0.025


def test_parse_sidecar_payload_partial(spark):
    df = spark.createDataFrame([("Preservation-Identifier: fmt/4",)], ["payload"])
    row = parse_sidecar_payload(df).first()
    assert row.puid == "fmt/4"
    assert row.mime is None and row.charset is None
    assert row.soft404 is None


def test_roundtrip_engine_payload(spark, docs100, media_tbl):
    # our own serialized payloads parse back to the same structured values
    side = sidecar_rows(docs100, media_tbl).limit(20)
    parsed = parse_sidecar_payload(side.select("doc_id", F.col("payload"))).collect()
    orig = {r.doc_id: r for r in side.collect()}
    for p in parsed:
        o = orig[p.doc_id]
        assert p.mime == o.mime
        assert p.puid == o.puid
        assert (p.charset is None) == (o.charset is None)
        if p.charset:
            assert p.charset.encoding == o.charset.encoding


def test_export_sidecar_warcs(spark, docs100, media_tbl):
    side = sidecar_rows(docs100, media_tbl)
    with_src = side.join(docs100.select("doc_id", "source_file"), "doc_id")
    blobs = export_sidecar_warcs(with_src, gzip=False).collect()
    assert blobs
    b = blobs[0]
    assert b.sidecar_file.endswith("warc.meta.gz")
    text = bytes(b.warc_bytes).decode()
    assert text.startswith("WARC/1.0\r\n")
    assert "WARC-Type: metadata" in text
    assert text.count("WARC/1.0") == b.n_records
    # ARC rows carry no Concurrent/Warcinfo headers
    arc_blob = [x for x in blobs if ".arc" in x.source_file or "arc.gz" in x.source_file]
    full = "".join(bytes(x.warc_bytes).decode() for x in blobs)
    assert "Identified-Payload-Type:" in full


def test_export_gzip_members_roundtrip(spark, docs100, media_tbl):
    """SNK1 gzip framing (reference WARCWriter gzip=True): one gzip member
    per record; the engine's own gz ingest parses the export back."""
    import gzip

    from warc_metadata_sidecar_spark.sources.warc_ingest import parse_warc_bytes

    side = sidecar_rows(docs100, media_tbl)
    with_src = side.join(docs100.select("doc_id", "source_file"), "doc_id")
    blob = export_sidecar_warcs(with_src, gzip=True).collect()[0]
    data = bytes(blob.warc_bytes)
    assert data[:2] == b"\x1f\x8b"
    # standard .warc.gz = one member per record (random access framing)
    assert data.count(b"\x1f\x8b\x08") >= blob.n_records
    rows = parse_warc_bytes(blob.sidecar_file, data)
    assert len(rows) == blob.n_records
    assert all(r["rec_type"] == "metadata" for r in rows)
    assert gzip.decompress(data).decode().startswith("WARC/1.0\r\n")


def test_write_sidecar_warc_files_roundtrip(spark, docs100, media_tbl, tmp_path):
    """SNK1 end to end: sidecar rows -> gzipped WARC files on disk ->
    re-ingested by the engine's own gz parser."""
    from warc_metadata_sidecar_spark.sources.warc_export import write_sidecar_warc_files
    from warc_metadata_sidecar_spark.sources.warc_ingest import ingest_warc_files

    side = sidecar_rows(docs100, media_tbl)
    with_src = side.join(docs100.select("doc_id", "source_file"), "doc_id")
    exported = export_sidecar_warcs(with_src)
    out = tmp_path / "sidecars"
    write_sidecar_warc_files(exported, str(out))
    files = sorted(out.glob("*.meta.gz"))
    assert files
    # arc.gz/warc.gz siblings collide under the reference rename rule; the
    # writer must keep BOTH (collision guard), so every exported record
    # survives the roundtrip
    back = ingest_warc_files(spark, str(out / "*.meta.gz"))
    n_expected = sum(r.n_records for r in exported.select("n_records").collect())
    assert back.count() == n_expected
    assert {r.rec_type for r in back.select("rec_type").distinct().collect()} == {"metadata"}


def test_lf_headers_with_crlf_in_payload_frame_correctly():
    """ADVICE r2: a record with LF-terminated headers whose payload contains
    a CRLF-CRLF sequence must not absorb payload bytes into the header block
    — the EARLIEST of \\r\\n\\r\\n / \\n\\n terminates headers."""
    from warc_metadata_sidecar_spark.sources.warc_ingest import parse_warc_bytes

    payload = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\nhello\r\n\r\nworld"
    rec = (
        b"WARC/1.0\n"
        b"WARC-Type: response\n"
        b"WARC-Record-ID: <urn:uuid:lf-1>\n"
        b"WARC-Target-URI: https://lf.example.com/\n"
        b"WARC-Date: 2021-11-11T21:11:11Z\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\n"
        b"\n" + payload + b"\r\n\r\n"
    )
    rows = parse_warc_bytes("lf.warc", rec)
    assert len(rows) == 1
    row = rows[0]
    assert row["http_status"] == "200"
    text = "".join(s["text"] or "" for s in row["spans"])
    # HTTP envelope stripped at ITS first blank line (the LF-LF), leaving the
    # full body including the CRLF-CRLF bytes
    assert text == "hello\r\n\r\nworld"
