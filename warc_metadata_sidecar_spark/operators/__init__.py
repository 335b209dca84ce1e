"""Relational pipelines: sidecar extraction, CDXJ index/merge, dedup, ANN."""
