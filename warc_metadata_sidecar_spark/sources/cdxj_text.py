"""CDXJ text source/sink (reference SRC3/SNK2).

Read: line text -> (line_id, urlkey, ts, json) via split(' ', 3)
(merge_cdxj.py:67,89,126-131). Write: concat_ws back to lines; output order
is the explicit line_id column (the reference preserves probe-side input
order, merge_cdxj.py:66-81), restored with a repartitionByRange+sort so the
sink stays distributed — coalesce(1) only for small golden-file exports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark.operators.cdxj import cdxj_lines, parse_cdxj_lines


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    return parse_cdxj_lines(spark.read.text(path))


def write_cdxj(df: DataFrame, path: str, single_file: bool = False) -> None:
    lines = cdxj_lines(df.orderBy("line_id")) if "line_id" in df.columns else cdxj_lines(df)
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)
