"""Scale evidence for the r7-session-4 text/frontier operators at 1x/10x.

Claims under test (the docstring plan shapes):

  main_content   one posexplode + one groupBy(doc_id): wall + shuffle
                 linear in pages
  trap_flags     ZERO shuffle (nested-HOF projection; forced via a
                 filter on the computed is_trap column so Catalyst
                 cannot prune the arithmetic)
  domain_stats   map-side-combined groupBy on ~50 domains: wall linear
                 (scan-bound), shuffle ~FLAT (partial aggs emit one row
                 per domain per task regardless of input rows)
  image_resize   mapInPandas decode+resize scan, zero shuffle

Results -> BENCH/NEWOPS6.md.  Run: python BENCH/newops6_scale.py
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


def pages_at(spark, reps: int):
    """4-block HTML pages from the docs (the main_content oracle shape)."""
    d = docs_at(spark, reps)
    ws = F.split(F.translate(F.coalesce("text", F.lit("")), "<>", "()"), " ")
    page = F.concat(
        F.lit("<p>"), F.concat_ws(" ", F.slice(ws, 1, 30)),
        F.lit('</p><div><a href="/x">'), F.concat_ws(" ", F.slice(ws, 31, 10)),
        F.lit("</a></div><div>"), F.concat_ws(" ", F.slice(ws, 41, 30)),
        F.lit(" <b>x</b></div><p>tiny</p>"),
    )
    return d.select("doc_id", page.alias("text"))


def urls_at(spark, reps: int):
    d = docs_at(spark, reps)
    i = (F.col("doc_id") % 10).cast("int")
    dd = F.col("doc_id").cast("int")
    url = (
        F.when(i == 4, F.format_string(
            "https://host%02d.example.com/cal/%d/cal/%d/cal/%d", dd % 50, dd, dd, dd))
        .when(i == 6, F.format_string(
            "https://host%02d.example.com/p?a=%d&b=1&c=2&d=3&e=4&f=5&g=6&h=7&i=8",
            dd % 50, dd))
        .otherwise(F.format_string(
            "https://host%02d.example.com/page/%d", dd % 50, dd))
    )
    return d.select(url.alias("url"))


def hosts_at(spark, reps: int):
    d = docs_at(spark, reps)
    return d.select(
        F.format_string(
            "www.host%02d.example%02d.com",
            (F.col("doc_id") % 50).cast("int"),
            (F.col("doc_id") % 25).cast("int"),
        ).alias("host"),
        "text",
    )


def blob_media(spark, reps: int):
    from warc_metadata_sidecar_spark import gen, schema

    base = spark.createDataFrame(gen.phash_rows(), schema.MEDIA)
    r = spark.range(reps).select(F.col("id").alias("rep"))
    return base.crossJoin(r).select(
        F.concat(F.lit("s"), F.col("rep"), F.lit("/"), "media_ref").alias("media_ref"),
        "bytes",
        "meta",
    )


def main() -> None:
    spark = build_session(
        "newops6-scale",
        cpus=16,
        extra={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4050",
            "spark.ui.retainedStages": "100000",
        },
    )
    from warc_metadata_sidecar_spark.frontier.traps import trap_flags
    from warc_metadata_sidecar_spark.operators.extract import main_content
    from warc_metadata_sidecar_spark.operators.phash import resize_images
    from warc_metadata_sidecar_spark.operators.quality import domain_stats

    rows = []
    # warmup
    main_content(pages_at(spark, 1)).count()
    trap_flags(urls_at(spark, 1)).where("is_trap").count()
    domain_stats(hosts_at(spark, 1)).count()
    resize_images(blob_media(spark, 20)).where("pixels is not null").count()

    for reps in (20, 200):
        p = pages_at(spark, reps).repartition(64).localCheckpoint(eager=True)
        n, wall, sh = measure(spark, main_content(p))
        rows.append(("main_content", reps, n, wall, sh))
        p.unpersist()

        u = urls_at(spark, reps).repartition(64).localCheckpoint(eager=True)
        n, wall, sh = measure(spark, trap_flags(u).where("is_trap"))
        rows.append(("trap_flags", reps, n, wall, sh))
        u.unpersist()

        hd = hosts_at(spark, reps).repartition(64).localCheckpoint(eager=True)
        n, wall, sh = measure(spark, domain_stats(hd))
        rows.append(("domain_stats", reps, n, wall, sh))
        hd.unpersist()

    for reps in (200, 2000):
        m = blob_media(spark, reps).repartition(64).localCheckpoint(eager=True)
        n, wall, sh = measure(
            spark, resize_images(m).where("pixels is not null")
        )
        rows.append(("image_resize", reps * 10, n, wall, sh))
        m.unpersist()

    md = ["# BENCH/NEWOPS6 — r7-session-4 operators: 1x vs 10x scale growth", ""]
    md.append("Inputs: documents sf0.1 replicated with distinct ids, rendered")
    md.append("into the per-operator shapes (4-block pages, planted trap URLs,")
    md.append("www.hostNN.exampleMM.com hosts -> 25 domains, phash raster")
    md.append("blobs). local[16], warmed JVM, shuffle bytes from the status")
    md.append("API (the localCheckpoint read shows up as the flat floor).")
    md.append("")
    md.append("| op | reps/rows | out rows | wall s | shuffle bytes |")
    md.append("|---|---|---|---|---|")
    for op, reps, n, wall, sh in rows:
        md.append(f"| {op} | {reps} | {n:,} | {wall} | {sh:,} |")
    md.append("")
    import datetime as dt

    md.append(
        f"Run: {dt.datetime.now(dt.timezone.utc).isoformat()} — `python BENCH/newops6_scale.py`."
    )
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "NEWOPS6.md"), "w"
    ) as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
