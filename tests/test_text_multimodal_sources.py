"""Tests: text-analysis expressions, multimodal plumbing, sources/sinks,
and the streaming extraction variant."""

import json

import pytest
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark import gen
from warc_metadata_sidecar_spark.functions.text import (
    bpe_ish_tokens_col,
    fingerprint_col,
    lang_guess_col,
    quality_score_col,
    token_count_col,
    winnow_fingerprints_col,
)
from warc_metadata_sidecar_spark.operators.multimodal import (
    decode_image,
    extract_media_features,
    frame_sample_plan,
    media_span_features,
)
from warc_metadata_sidecar_spark.sources.cdxj_text import read_cdxj, write_cdxj
from warc_metadata_sidecar_spark.sources.tables import (
    read_documents,
    write_documents,
    write_sidecar,
)
from warc_metadata_sidecar_spark.sources.warc_ingest import ingest_warc_files, parse_warc_bytes


# --- text analysis ------------------------------------------------------------

def test_text_expressions(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house",),
            ("el perro y la casa que los gatos",),
            ("xyzzy plugh",),
        ],
        ["text"],
    )
    rows = df.select(
        token_count_col(F.col("text")).alias("n"),
        lang_guess_col(F.col("text")).alias("lang"),
        quality_score_col(F.col("text")).alias("q"),
        fingerprint_col(F.col("text")).alias("fp"),
        F.size(bpe_ish_tokens_col(F.col("text"))).alias("bpe_n"),
        F.size(winnow_fingerprints_col(F.col("text"))).alias("n_fp"),
    ).collect()
    assert rows[0].n == 8
    assert rows[0].lang == "en"
    assert rows[1].lang == "es"
    assert rows[2].lang == "und"
    assert 0.0 <= rows[0].q <= 1.0
    assert len(rows[0].fp) == 32
    assert rows[0].bpe_n >= rows[0].n
    assert rows[0].n_fp >= 0


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame([("a  b\tc",), ("a b c",)], ["text"])
    fps = [r.fp for r in df.select(fingerprint_col(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


# --- multimodal ---------------------------------------------------------------

def test_decode_stub_contract():
    feats = decode_image(b"GIF89a+fakebytes")
    assert len(feats) == 16 and all(0.0 <= f < 1.0 for f in feats)
    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a", real=True)


def test_media_features_and_span_join(spark, docs100, media_tbl):
    feats = extract_media_features(media_tbl).collect()
    assert len(feats) == media_tbl.count()
    by_ref = {r.media_ref: r for r in feats}
    assert by_ref["media://gif/0"].sniffed_mime == "image/gif"
    assert by_ref["media://png/0"].sniffed_mime == "image/png"
    assert len(by_ref["media://gif/0"].features) == 16

    joined = media_span_features(docs100, media_tbl)
    rows = joined.collect()
    assert rows and all(r.sniffed_mime == "image/gif" for r in rows)


def test_frame_sample_plan(spark):
    from warc_metadata_sidecar_spark import schema as sch

    media = spark.createDataFrame(
        [
            {
                "media_ref": "media://vid/0",
                "bytes": b"\x00\x00\x00\x18ftypisom",
                "meta": {"media_type": "video", "width": 64, "height": 64, "duration_ms": 3500},
            }
        ],
        sch.MEDIA,
    )
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert [f.frame_ms for f in frames] == [0, 1000, 2000, 3000]


# --- sources / sinks ----------------------------------------------------------

def test_documents_roundtrip(spark, docs100, tmp_path):
    path = str(tmp_path / "docs")
    write_documents(docs100, path)
    back = read_documents(spark, path)
    assert back.count() == docs100.count()
    assert set(back.columns) == set(docs100.columns)


def test_write_sidecar_and_empty_rewrite(spark, docs100, media_tbl, tmp_path):
    from warc_metadata_sidecar_spark.operators.sidecar import sidecar_rows

    side = sidecar_rows(docs100, media_tbl)
    info = write_sidecar(side, str(tmp_path / "s1"), "crawl-00000.warc.gz", operator="op")
    assert "0 metadata sidecar records" not in info["description"]
    assert info["operator"] == "op"
    prov = spark.read.parquet(str(tmp_path / "s1" / "provenance")).first()
    assert prov.records_written == side.count()

    # SNK5: dns-only input -> zero rows -> provenance-only output with the
    # amended description (warc_metadata_sidecar.py:284-293)
    empty = side.filter(F.lit(False))
    info2 = write_sidecar(empty, str(tmp_path / "s2"), "dns.warc")
    assert info2["description"].endswith("; 0 metadata sidecar records")


def test_cdxj_text_roundtrip(spark, tmp_path):
    lines = [
        'com,example) 20211111211111 {"url": "http://example.com"}',
        'org,unt) 20211111211112 {"mime": "text/html"}',
    ]
    src = tmp_path / "in.cdxj"
    src.write_text("\n".join(lines) + "\n")
    df = read_cdxj(spark, str(src))
    assert df.count() == 2
    out = tmp_path / "out"
    write_cdxj(df, str(out), single_file=True)
    written = sorted(
        line for f in out.glob("part-*") for line in f.read_text().splitlines()
    )
    assert written == sorted(lines)


def test_warc_ingest_fallback_parser(spark, tmp_path):
    warc_text = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Record-ID: <urn:uuid:rec-1>\r\n"
        "WARC-Target-URI: https://www.unt.edu\r\n"
        "WARC-Payload-Digest: sha1:AAA\r\n"
        "Content-Type: application/http\r\n"
        "\r\n"
        "HTTP/1.1 200 OK\r\n"
        "Content-Type: text/html\r\n"
        "\r\n"
        "<!DOCTYPE html><html><body>hello the web</body></html>\r\n"
        "\r\n"
    )
    rows = parse_warc_bytes("x.warc", warc_text.encode())
    assert len(rows) == 1
    assert rows[0]["rec_type"] == "response"
    assert rows[0]["http_status"] == "200"
    assert rows[0]["url"] == "https://www.unt.edu"
    assert "<!DOCTYPE html>" in rows[0]["spans"][0]["text"]

    f = tmp_path / "sample.warc"
    f.write_bytes(warc_text.encode())
    df = ingest_warc_files(spark, str(f))
    got = df.collect()
    assert len(got) == 1 and got[0].doc_id == "<urn:uuid:rec-1>"
    assert got[0].is_arc is False


# --- streaming ------------------------------------------------------------------

def test_streaming_sidecar_matches_batch(spark, docs100, media_tbl, tmp_path):
    from warc_metadata_sidecar_spark.operators.sidecar import sidecar_rows
    from warc_metadata_sidecar_spark.streaming.sidecar_stream import start_sidecar_stream

    in_dir = str(tmp_path / "in")
    docs100.write.mode("overwrite").parquet(in_dir)
    q = start_sidecar_stream(
        spark,
        in_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        media=media_tbl,
        ledger_dir=str(tmp_path / "ledger"),
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(str(tmp_path / "out"))
    batch = sidecar_rows(docs100, media_tbl)
    assert got.count() == batch.count()
    g = {r.doc_id: r.payload for r in got.collect()}
    b = {r.doc_id: r.payload for r in batch.collect()}
    assert g == b
    ledger = spark.read.parquet(str(tmp_path / "ledger"))
    assert ledger.count() == ledger.select("payload_digest").distinct().count()
