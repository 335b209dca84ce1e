"""warc_metadata_sidecar_spark — a from-scratch PySpark-native engine with the
query and data-processing capabilities of unt-libraries/warc-metadata-sidecar.

The reference (/root/reference) is a single-threaded, per-record Python loop
over WARC/ARC files that (1) extracts per-record metadata (mime/puid, charset,
language, soft-404) into a "sidecar" WARC, (2) indexes it as CDXJ, and
(3) merges that CDXJ with the original WARC's CDXJ.

This engine re-expresses those semantics over columnar tables with the
DataFrame/SQL API plus vectorized pandas/Arrow UDFs, and extends them with a
distributed crawl frontier + politeness scheduler (BASELINE.json north_rule)
and large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing).

Layout:
  session.py        SparkSession builders (AQE, Arrow, UTC, shuffle sizing)
  schema.py         StructTypes for documents/sidecar/cdxj/frontier tables
  gen.py            deterministic synthetic data generator (seed=42)
  functions/        scalar/vectorized expression library (detectors, surt,
                    hashing, text analysis)
  operators/        relational pipelines (sidecar extraction, cdxj index +
                    merge, dedup, similarity, multimodal)
  sources/          readers/writers (documents, cdxj text, warc ingest stub)
  frontier/         crawl frontier: canonicalize, URL-seen, scheduler, loop
  streaming/        structured-streaming variants
  plans/            plan inspection helpers (explain audits)
"""

__version__ = "0.1.0"
