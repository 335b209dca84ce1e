"""Table schemas (analysis-time, fixed StructTypes).

The reference has no schema system — field presence is decided per row by
``if`` guards and JSON blocks are heterogeneous (warc_metadata_sidecar.py:
151-164, sidecar2cdxj.py:18-29). The Spark idiom is a fixed nullable schema;
``to_json`` with null-dropping reproduces the reference's field-absence
semantics at the serialization edge.

Schemas follow FIXTURES.md T1-T4 and BASELINE.json ``input_hint``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- T1: documents — the primary input (input_hint, non-negotiable core) ---
# One row per archive record. `spans` is the interleaved text+media payload;
# span order is defined by `offset` (per-row invariant vs the reference:
# span-sequence equality on (kind, text, media_ref, order)).
# CONTRACT: spans are stored sorted by offset — writers sort once
# (sources/tables.write_documents, operators/sidecar.normalize_spans_col);
# readers never re-sort.
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # 'text' | 'media'
        T.StructField("text", T.StringType()),  # null for media spans
        T.StructField("media_ref", T.StringType()),  # null for text spans
        T.StructField("offset", T.IntegerType()),  # byte offset; span order
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),  # cf. WARC-Record-ID
        T.StructField("spans", T.ArrayType(SPAN)),
        # WARC header companions (warc_metadata_sidecar.py:207-228,263)
        T.StructField("url", T.StringType()),  # WARC-Target-URI
        T.StructField("warc_date", T.TimestampType()),  # WARC-Date
        T.StructField("rec_type", T.StringType()),
        T.StructField("payload_digest", T.StringType()),  # null for ARC rows
        T.StructField("warcinfo_id", T.StringType()),
        T.StructField("http_status", T.StringType()),
        T.StructField("is_arc", T.BooleanType()),
        T.StructField("source_file", T.StringType()),
    ]
)

# Ingest-extended documents: `charset_head` carries the FIRST 8 KiB of the
# raw payload bytes, ONLY when the payload is not valid UTF-8 (VERDICT r5
# #2 — the reference runs chardet on raw bytes, warc_metadata_sidecar.py:
# 91-102, and the utf-8-replace decode is lossy exactly for legacy
# encodings). UTF-8/ascii pages (the vast majority of the web) carry NULL,
# so the column costs ~nothing at 100 TB and is column-pruned unless the
# detector stage reads it. Optional everywhere: operators fall back to the
# decode-artifact charset ladder when the column is absent or NULL.
DOCUMENTS_INGEST = T.StructType(
    list(DOCUMENTS.fields) + [T.StructField("charset_head", T.BinaryType())]
)

# --- media blobs: multimodal payloads as opaque binary + typed metadata ---
# media_ref in a span points into this table. Bytes carry real magic numbers
# so mime sniffing works on content, not names.
MEDIA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("bytes", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType()),  # image|audio|video
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

# --- T2: sidecar — output of the extraction stage ---
CHARSET = T.StructType(
    [
        T.StructField("encoding", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)

LANG_ENTRY = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("code", T.StringType()),
        T.StructField("text_covered", T.IntegerType()),
        T.StructField("score", T.DoubleType()),
    ]
)

LANGUAGES = T.StructType(
    [
        T.StructField("reliable", T.BooleanType()),
        T.StructField("text_bytes", T.IntegerType()),
        T.StructField("languages", T.ArrayType(LANG_ENTRY)),
    ]
)

SIDECAR = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.TimestampType()),
        T.StructField("concurrent_id", T.StringType()),  # null when is_arc
        T.StructField("warcinfo_id", T.StringType()),  # null when is_arc
        T.StructField("mime", T.MapType(T.StringType(), T.StringType())),
        T.StructField("puid", T.StringType()),
        T.StructField("charset", CHARSET),
        T.StructField("languages", LANGUAGES),
        T.StructField("soft404", T.DoubleType()),
        # serialized 'Title: value' payload, byte-golden vs
        # create_string_payload (warc_metadata_sidecar.py:151-164)
        T.StructField("payload", T.StringType()),
    ]
)

# --- T3: CDXJ frames (index + merge inputs) ---
CDXJ = T.StructType(
    [
        T.StructField("line_id", T.LongType(), False),  # input order; preserved on write
        T.StructField("urlkey", T.StringType()),
        T.StructField("ts", T.StringType()),  # 14-digit yyyyMMddHHmmss
        T.StructField("json", T.StringType()),  # schemaless JSON block
    ]
)

# --- T4: frontier / robots / seen (north-rule tables) ---
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("canonical_url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("host_salt", T.IntegerType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("discovery_round", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("parent_url", T.StringType()),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("path_prefix", T.StringType()),
        T.StructField("allowed", T.BooleanType()),
        T.StructField("crawl_delay_s", T.IntegerType()),
        T.StructField("budget", T.IntegerType()),
    ]
)

SEEN = T.StructType(
    [
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("first_round", T.IntegerType()),
    ]
)

# detector-stage struct returned by the vectorized UDF (functions/detectors.py)
DETECTED = T.StructType(
    [
        T.StructField("mime_fido", T.StringType()),
        T.StructField("mime_magic", T.StringType()),
        T.StructField("puid", T.StringType()),
        T.StructField("charset_encoding", T.StringType()),
        T.StructField("charset_confidence", T.DoubleType()),
        T.StructField("languages_json", T.StringType()),
        T.StructField("soft404", T.DoubleType()),
        T.StructField("payload", T.StringType()),
    ]
)
