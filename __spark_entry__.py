"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship sidecar-extraction pipeline at sf0.001
queries()     -> one entry per implemented operator (SURVEY.md §2)
oracle_sql()  -> DuckDB-equivalent SQL per SQL-expressible query

Implementation lives in warc_metadata_sidecar_spark/driver_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from warc_metadata_sidecar_spark import driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's metadata
    sidecar extraction (filters -> digest dedup -> vectorized detectors ->
    serialized payload) over the documents table."""
    return driver_queries.flagship_sidecar(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    return driver_queries.oracle_sql()
