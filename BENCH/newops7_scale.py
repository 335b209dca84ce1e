"""Scale evidence for the r7-session-5 operators at 1x/10x.

Claims under test (the docstring plan shapes):

  url_blocklist   per-depth broadcast suffix joins: corpus map-side,
                  shuffle ~FLAT (only the blocklist's own dedup), wall
                  linear in rows
  postings_build  ONE real term exchange: shuffle linear in token rows,
                  wall linear (WindowGroupLimit caps the output)
  cdc_chunks+stats  mapInPandas chunk scan + (md5,length)-only
                  accounting shuffle: wall linear in bytes, shuffle
                  linear in chunk count (small rows, never content)
  crawl_diff      one urlkey exchange per side + full-outer join:
                  wall + shuffle linear in captures
  text_normalize  key projection (one Arrow NFC UDF + native folds):
                  ZERO shuffle (forced through a count on the key)

Results -> BENCH/NEWOPS7.md.  Run: python BENCH/newops7_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from warc_metadata_sidecar_spark.frontier.crawl import shuffle_totals
from warc_metadata_sidecar_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def measure(spark, df):
    before = shuffle_totals(spark)
    t0 = time.time()
    n = df.count()
    wall = time.time() - t0
    after = shuffle_totals(spark)
    return n, round(wall, 2), after[0] - before[0]


def docs_at(spark, reps: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    r = spark.range(reps).select(F.col("id").alias("rep"))
    return base.crossJoin(r).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"), "text"
    )


def urls_at(spark, reps: int):
    d = docs_at(spark, reps)
    return d.select(
        "doc_id",
        F.format_string(
            "https://sub%d.h%d.example%d.net/p/%d%s",
            (F.col("doc_id") % 3).cast("int"),
            (F.col("doc_id") % 97).cast("int"),
            (F.col("doc_id") % 11).cast("int"),
            F.col("doc_id").cast("int"),
            F.when(F.col("doc_id") % 13 == 0, F.lit("/casino")).otherwise(
                F.lit("/fine")
            ),
        ).alias("url"),
    )


def main() -> None:
    spark = build_session(
        "newops7-scale",
        cpus=16,
        extra={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4051",
            "spark.ui.retainedStages": "100000",
        },
    )
    rows = []

    from warc_metadata_sidecar_spark.frontier.urlfilter import blocklist_filter
    from warc_metadata_sidecar_spark.operators.cdc import cdc_chunks, cdc_dedup_stats
    from warc_metadata_sidecar_spark.operators.cdxj import snapshot_diff
    from warc_metadata_sidecar_spark.operators.invindex import build_postings
    from warc_metadata_sidecar_spark.functions.text import normalize_dedup_key_col
    from warc_metadata_sidecar_spark import gen, schema

    bl = spark.createDataFrame(
        [(f"h{i}.example{i % 11}.net",) for i in range(0, 97, 3)]
        + [("example7.net",)],
        "domain: string",
    )

    # warm the JVM/broadcast machinery so row 1 isn't startup-skewed
    measure(spark, blocklist_filter(urls_at(spark, 1), bl, ("casino",)))

    for reps in (2, 20, 200):
        u = urls_at(spark, reps)
        out = blocklist_filter(u, bl, ("casino", "xxx")).where(~F.col("keep"))
        rows.append(("url_blocklist", reps, *measure(spark, out)))

    for reps in (2, 20):
        d = docs_at(spark, reps)
        rows.append(
            ("postings_build", reps,
             *measure(spark, build_postings(d, min_df=3, max_postings=10)))
        )

    media = spark.createDataFrame(gen.cdc_rows(), schema.MEDIA)
    for reps in (25, 250):
        r = spark.range(reps).select(F.col("id").alias("rep"))
        m = media.crossJoin(r).select(
            F.format_string("%s/%d", "media_ref", "rep").alias("media_ref"),
            "bytes",
        )
        chunks = cdc_chunks(m)
        rows.append(("cdc_chunks", reps, *measure(spark, chunks)))
        rows.append(("cdc_dedup", reps, *measure(spark, cdc_dedup_stats(cdc_chunks(m)))))

    for reps in (2, 20):
        d = docs_at(spark, reps)
        old = d.select(
            F.format_string("k)/p/%d", "doc_id").alias("urlkey"),
            F.lit("20250101").alias("ts"),
            F.format_string("sha1:%d", (F.col("doc_id") % 7).cast("int")).alias("digest"),
        ).where(F.col("doc_id") % 10 != 3)
        new = d.select(
            F.format_string("k)/p/%d", "doc_id").alias("urlkey"),
            F.lit("20260101").alias("ts"),
            F.format_string(
                "sha1:%d",
                ((F.col("doc_id") % 7)
                 + F.when(F.col("doc_id") % 5 == 0, 1).otherwise(0)).cast("int"),
            ).alias("digest"),
        ).where(F.col("doc_id") % 10 != 6)
        rows.append(("crawl_diff", reps, *measure(spark, snapshot_diff(old, new))))

    for reps in (2, 20, 200):
        d = docs_at(spark, reps)
        keyed = d.select(normalize_dedup_key_col(F.col("text")).alias("key")).where(
            F.length("key") > 0
        )
        rows.append(("text_normalize", reps, *measure(spark, keyed)))

    print("| op | reps | out rows | wall s | shuffle bytes |")
    print("|---|---|---|---|---|")
    for name, reps, n, wall, sh in rows:
        print(f"| {name} | {reps} | {n:,} | {wall} | {sh:,} |")
    spark.stop()


if __name__ == "__main__":
    main()
