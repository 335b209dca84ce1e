"""Structured-Streaming variants of the extraction stage."""
