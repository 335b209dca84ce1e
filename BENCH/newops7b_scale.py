"""Scale evidence, part 2, for the r7-session-5 operators at 1x/10x.

Claims under test:
  feed_items      projection + explode, zero shuffle
  language_mix    explode -> ONE (doc,lang) map-side count + doc window:
                  shuffle linear in docs
  batch_plan      per-bucket window: one bucket exchange, linear
  balanced_shards same window shape
  mirror_groups   (host,digest) distinct + capped per-digest self-join +
                  pair agg + star rounds: shuffle linear in captures,
                  never quadratic (the cap kills boilerplate digests)

Results -> BENCH/NEWOPS7.md (appended).  Run: python BENCH/newops7b_scale.py
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


def main() -> None:
    spark = build_session(
        "newops7b-scale",
        cpus=16,
        extra={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4052",
            "spark.ui.retainedStages": "100000",
        },
    )
    rows = []

    from warc_metadata_sidecar_spark.frontier.feeds import extract_feed_items
    from warc_metadata_sidecar_spark.frontier.graph import mirror_groups
    from warc_metadata_sidecar_spark.operators.batching import (
        balanced_shards,
        plan_batches,
    )
    from warc_metadata_sidecar_spark.operators.quality import language_mix

    # warm-up
    measure(spark, docs_at(spark, 1).select("doc_id"))

    for reps in (2, 20):
        d = docs_at(spark, reps)
        feeds = d.select(
            F.format_string("https://h%d.example.com/feed.xml",
                            (F.col("doc_id") % 50).cast("int")).alias("url"),
            F.format_string(
                "<rss><channel><item><link>https://h%d.example.com/a/%d</link>"
                "</item><item><link>/rel/%d</link></item></channel></rss>",
                (F.col("doc_id") % 50).cast("int"),
                F.col("doc_id").cast("int"), F.col("doc_id").cast("int"),
            ).alias("xml"),
        )
        rows.append(("feed_items", reps, *measure(spark, extract_feed_items(feeds))))

    for reps in (2, 20):
        d = docs_at(spark, reps).select(
            "doc_id",
            F.concat(
                F.lit("the cat and dog\n"),
                F.when(F.col("doc_id") % 3 == 0, F.lit("el perro la casa"))
                .otherwise(F.lit("more of the words")),
            ).alias("text"),
        )
        rows.append(("language_mix", reps, *measure(spark, language_mix(d))))

    for reps in (2, 20):
        d = docs_at(spark, reps).select(
            "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
        )
        # force the window columns (count() alone lets ColumnPruning
        # delete an unreferenced window -> a 59-byte non-measurement)
        rows.append(
            ("batch_plan", reps,
             *measure(spark, plan_batches(d).where(F.col("pos") >= 0)))
        )
        rows.append(
            ("balanced_shards", reps,
             *measure(spark, balanced_shards(d).where(F.col("shard") >= 0)))
        )

    for reps in (2, 20):
        d = docs_at(spark, reps)
        caps = d.select(
            F.format_string("m%d.example.com",
                            (F.col("doc_id") % 20).cast("int")).alias("host"),
            F.when(
                F.col("doc_id") % 13 == 0, F.lit("common")  # capped boilerplate
            ).when(
                F.col("doc_id") % 20 <= 5,
                F.format_string("d%d", ((F.col("doc_id") / 20).cast("long") % 500).cast("int")),
            ).otherwise(
                F.format_string("u%d", F.col("doc_id").cast("int"))
            ).alias("digest"),
        )
        rows.append(
            ("mirror_groups", reps,
             *measure(spark, mirror_groups(caps, min_shared=3,
                                           max_hosts_per_digest=10)))
        )

    print("| op | reps | out rows | wall s | shuffle bytes |")
    print("|---|---|---|---|---|")
    for name, reps, n, wall, sh in rows:
        print(f"| {name} | {reps} | {n:,} | {wall} | {sh:,} |")
    spark.stop()


if __name__ == "__main__":
    main()
