"""Readers and writers: documents/sidecar tables, CDXJ text, WARC ingest."""
