"""Table-level ports of /root/reference/tests/test_warc_metadata_sidecar.py
end-to-end assertions (:118-233) against the sidecar extraction pipeline."""

import pytest
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark import gen
from warc_metadata_sidecar_spark.operators.sidecar import (
    base_filters,
    sidecar_counters,
    sidecar_rows,
)


@pytest.fixture(scope="module")
def sidecar(spark, docs100, media_tbl):
    return sidecar_rows(docs100, media_tbl).cache()


def _by_arch(sidecar_df, arch_index):
    # generator cycles archetypes by doc index mod 10
    return sidecar_df.filter(
        F.expr(f"CAST(regexp_extract(doc_id, '-(\\\\d+)>$', 1) AS BIGINT) % 10 = {arch_index}")
    )


def test_filters_drop_dns_revisit_empty(spark, docs100, media_tbl):
    # dns rows (arch 1), revisit (arch 3), empty payload (arch 7) never reach
    # the detector stage (warc_metadata_sidecar.py:207-215)
    kept = base_filters(docs100)
    kept_arch = (
        kept.select(
            (F.expr("CAST(regexp_extract(doc_id, '-(\\\\d+)>$', 1) AS BIGINT)") % 10).alias("a")
        )
        .distinct()
        .toPandas()["a"]
        .tolist()
    )
    assert 1 not in kept_arch
    assert 3 not in kept_arch
    assert 7 not in kept_arch
    assert {0, 2, 4, 5, 6, 8, 9} <= set(kept_arch)


def test_html_200_full_metadata(sidecar):
    # cf. test_metadata_sidecar (:118-142): html rows get all five fields
    row = _by_arch(sidecar, 0).filter(F.col("soft404").isNotNull()).first()
    assert row.mime["fido"] == "text/html"
    assert row.mime["python-magic"] == "text/html"
    assert row.puid == "fmt/471"
    assert row.charset.encoding == "ascii"
    assert row.charset.confidence == 1.0
    assert row.languages.languages[0].code in ("en", "es")
    assert 0.0 <= row.soft404 < 1.0
    assert row.payload.startswith("Identified-Payload-Type:")


def test_gif_mime_only_exact_payload(sidecar):
    # cf. test_gif_warc (:155-175): mime/puid only; payload byte-exact
    row = _by_arch(sidecar, 2).first()
    assert row.mime["fido"] == "image/gif"
    assert row.puid == "fmt/4"
    assert row.charset is None
    assert row.languages is None
    assert row.soft404 is None
    assert row.payload == (
        'Identified-Payload-Type: {"fido": "image/gif", "python-magic": "image/gif"}\n'
        "Preservation-Identifier: fmt/4"
    )


def test_arc_rows_no_concurrent_or_warcinfo_id(sidecar):
    # cf. test_metadata_sidecar_with_arc (:188-197)
    rows = _by_arch(sidecar, 4).collect()
    assert rows
    for row in rows:
        assert row.concurrent_id is None
        assert row.warcinfo_id is None
        assert row.mime["fido"] == "text/plain"


def test_warc_rows_carry_ids(sidecar):
    row = _by_arch(sidecar, 0).first()
    assert row.concurrent_id == row.doc_id
    assert row.warcinfo_id is not None


def test_digest_dedup_detectors_once_per_digest(spark, docs100, media_tbl):
    # cf. test_digest_cache (:199-233): duplicate digests share one detector
    # run; all duplicate rows still emit metadata
    side = sidecar_rows(docs100, media_tbl)
    dup = side.join(
        docs100.select("doc_id", "payload_digest"), "doc_id"
    ).filter(F.col("payload_digest").isNotNull())
    per_digest = dup.groupBy("payload_digest").agg(
        F.countDistinct("payload").alias("n_payloads"), F.count("*").alias("n_rows")
    )
    assert per_digest.filter(F.col("n_payloads") > 1).count() == 0
    # html_200 rows share digests across the 100-row sample (same html text)
    assert per_digest.filter(F.col("n_rows") > 1).count() > 0


def test_soft404_gating(sidecar):
    # soft404_page (arch 8, status 200) scored; non_200_html (arch 9) not
    s404 = _by_arch(sidecar, 8).first()
    assert s404.soft404 is not None and s404.soft404 > 0.3
    n200 = _by_arch(sidecar, 9).first()
    assert n200.soft404 is None
    assert n200.charset is not None  # charset/lang still run for text


def test_counters(spark, docs100, media_tbl):
    # cf. counter assertions across :118-233 and :299-303
    counters = sidecar_counters(docs100, media_tbl).first()
    assert counters.total_records_read == 100
    # per 10-row block: dns/revisit/empty filtered -> 7 reach detectors
    assert counters.mime_type_records == 70
    assert counters.text_mime + counters.non_text == counters.mime_type_records
    # gif is the only non-text archetype that reaches the detectors
    assert counters.non_text == 10
    assert counters.records_written == 70


def test_dns_only_input_writes_zero(spark, media_tbl):
    # cf. test_metadata_sidecar_with_dns_warc (:144-153): 0 records written
    docs = gen.documents(spark, 100).filter(F.col("url").startswith("dns:"))
    counters = sidecar_counters(docs, media_tbl).first()
    assert counters.records_written == 0
    assert counters.mime_type_records == 0


def test_span_sequence_preserved(spark, docs100):
    # per-row invariant vs the reference: span-sequence equality
    # (kind, text, media_ref, order) — BASELINE.json input_hint
    row = docs100.filter(F.expr("size(spans) = 2")).first()
    assert [s.offset for s in row.spans] == sorted(s.offset for s in row.spans)
    rebuilt = "".join(s.text or "" for s in sorted(row.spans, key=lambda s: s.offset))
    assert rebuilt


def test_hot_digest_skew_detectors_once(spark):
    """Beacon-page skew (SURVEY §4: digest_multiples at scale): one digest
    carried by 5,000 rows plus 200 distinct rows. The rep election's partial
    aggregation absorbs the hot key map-side; detectors run once for the hot
    digest (identical payload on every duplicate row); every row still gets
    annotated."""
    from pyspark.sql import functions as F

    hot = spark.range(5000).select(
        F.concat(F.lit("hot-"), F.col("id")).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.lit("<!DOCTYPE html><html><body>beacon pixel page</body></html>").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
        F.concat(F.lit("https://beacon.example.com/p/"), F.col("id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_date"),
        F.lit("response").alias("rec_type"),
        F.lit("sha1:HOTDIGEST").alias("payload_digest"),
        F.lit(None).cast("string").alias("warcinfo_id"),
        F.lit("200").alias("http_status"),
        F.lit(False).alias("is_arc"),
        F.lit("skew.warc").alias("source_file"),
    )
    cold = spark.range(200).select(
        F.concat(F.lit("cold-"), F.col("id")).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.concat(F.lit("<html><body>distinct page "), F.col("id"), F.lit("</body></html>")).alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
        F.concat(F.lit("https://site.example.com/p/"), F.col("id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_date"),
        F.lit("response").alias("rec_type"),
        F.concat(F.lit("sha1:C"), F.col("id")).alias("payload_digest"),
        F.lit(None).cast("string").alias("warcinfo_id"),
        F.lit("200").alias("http_status"),
        F.lit(False).alias("is_arc"),
        F.lit("skew.warc").alias("source_file"),
    )
    docs = hot.unionByName(cold).repartition(16)
    side = sidecar_rows(docs)
    rows = side.collect()
    assert len(rows) == 5200  # every row annotated
    hot_payloads = {r.payload for r in rows if r.doc_id.startswith("hot-")}
    assert len(hot_payloads) == 1  # one detector result shared by all 5,000


def test_resolve_revisits_first_occurrence_and_boundary(spark):
    """operators/sidecar.resolve_revisits: duplicate-digest responses
    resolve to the FIRST (min doc_id) original — the digest-memoization
    rule — and a revisit whose digest matches no response resolves to
    nulls (archive boundary)."""
    from warc_metadata_sidecar_spark.operators.sidecar import resolve_revisits

    rows = [
        (1, "u1", "response", "dA"),
        (2, "u2", "response", "dA"),  # duplicate content, NOT the original
        (3, "u3", "response", "dB"),
        (4, "u4", "revisit", "dA"),
        (5, "u5", "revisit", "dB"),
        (6, "u6", "revisit", "dZ"),   # no matching response
        (7, "u7", "response", None),  # ARC-style: no digest, never an anchor
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, rec_type string, payload_digest string"
    )
    got = {
        r["doc_id"]: (r["original_doc_id"], r["original_url"])
        for r in resolve_revisits(df).collect()
    }
    assert got == {4: (1, "u1"), 5: (3, "u3"), 6: (None, None)}
