"""Scale evidence for the r6-session-3 operators: the same op at 1x and
10x input, reporting wall + shuffle-byte growth. The claim under test is
the docstring plan shape of each op:

  paragraph_dedup   2 content-hash exchanges -> shuffle grows ~linearly
                    with the paragraph stream, wall ~linearly
  dsir_select       model frames are <=256 rows; the only corpus shuffle
                    is the per-doc bucket groupBy -> linear, small constant
  classifier_train  training sample is CAPPED (max_train) -> the iteration
                    cost is ~FLAT in corpus size; only the one feature-build
                    scan grows
  semantic_dedup    assignment is a broadcast argmax (no vector shuffle);
                    pair work is sum |c|^2 ~= n * avg_cluster — k grows
                    with n so avg_cluster stays fixed -> ~linear

Shuffle bytes via the status REST API (spark.ui.enabled in this session
only), the BENCH/seen_shuffle.py machinery. Results -> BENCH/NEWOPS2.md.

Run: python BENCH/newops_scale.py
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
    """documents sf0.1 replicated `reps`x with distinct ids and the text
    rewritten into 3 paragraphs (first/second 8-word slices + a shared
    boilerplate footer on 1/3 of docs) so paragraph_dedup does real work."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    r = spark.range(reps).select(F.col("id").alias("rep"))
    big = base.crossJoin(r).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "text",
        "lang",
    )
    ws = big.withColumn("ws", F.split("text", " "))
    return ws.select(
        "doc_id",
        "lang",
        F.concat_ws(
            "\n",
            F.concat_ws(" ", F.slice("ws", 1, 8)),
            F.concat_ws(" ", F.slice("ws", 9, 8)),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("subscribe to our newsletter for updates"),
            ).otherwise(F.concat_ws(" ", F.slice("ws", 17, 8))),
        ).alias("text"),
    )


def embeddings_at(spark, reps: int):
    """embeddings sf0.1 replicated with a deterministic per-rep rotation
    (element shift) so replicas land in different clusters."""
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    r = spark.range(reps).select(F.col("id").alias("rep"))
    return base.crossJoin(r).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        F.concat(
            F.slice(F.col("embedding"), (F.col("rep") % 64 + 1).cast("int"), 64),
            F.slice(F.col("embedding"), 1, (F.col("rep") % 64).cast("int")),
        ).alias("embedding"),
    )


def main() -> None:
    spark = build_session(
        "newops-scale",
        cpus=16,
        extra={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4049",
            "spark.ui.retainedStages": "100000",
        },
    )
    from warc_metadata_sidecar_spark.operators.classifier import (
        train_linear_classifier,
    )
    from warc_metadata_sidecar_spark.operators.dedup import paragraph_dedup
    from warc_metadata_sidecar_spark.operators.sampling import dsir_select
    from warc_metadata_sidecar_spark.operators.similarity import semantic_dedup

    rows = []

    # JVM/codegen warmup so the 1x walls aren't first-call-dominated
    warm = docs_at(spark, 2).repartition(8).localCheckpoint(eager=True)
    paragraph_dedup(warm).count()
    dsir_select(warm, warm.filter(F.col("lang") == "en"), k=100).count()
    train_linear_classifier(
        warm.withColumn("y", (F.col("lang") == "en").cast("double")), "y",
        iters=3, eta=0.5,
    )
    warm.unpersist()

    for reps in (20, 200):
        d = docs_at(spark, reps).repartition(64).localCheckpoint(eager=True)
        n, wall, sh = measure(spark, paragraph_dedup(d))
        rows.append(("paragraph_dedup", reps, n, wall, sh))

        n, wall, sh = measure(
            spark, dsir_select(d, d.filter(F.col("lang") == "en"), k=1000)
        )
        rows.append(("dsir_select", reps, n, wall, sh))

        before = shuffle_totals(spark)
        t0 = time.time()
        labeled = d.withColumn("y", (F.col("lang") == "en").cast("double"))
        w, bias = train_linear_classifier(labeled, "y", iters=3, eta=0.5)
        wall = round(time.time() - t0, 2)
        sh = shuffle_totals(spark)[0] - before[0]
        rows.append(("classifier_train", reps, len(w), wall, sh))
        d.unpersist()

    we = embeddings_at(spark, 2).repartition(8).localCheckpoint(eager=True)
    semantic_dedup(we, k=16, threshold=0.9, iters=1).count()
    we.unpersist()
    for reps, k in ((5, 50), (50, 500)):
        e = embeddings_at(spark, reps).repartition(64).localCheckpoint(eager=True)
        n, wall, sh = measure(
            spark, semantic_dedup(e, k=k, threshold=0.9, iters=1)
        )
        rows.append((f"semantic_dedup k={k}", reps, n, wall, sh))
        e.unpersist()

    md = ["# BENCH/NEWOPS2 — r6-session-3 operators: 1x vs 10x scale growth", ""]
    md.append("Input: documents/embeddings sf0.1 replicated (distinct ids; 3-paragraph")
    md.append("rewrite for text ops: 100k vs 1M docs / 300k vs 3M paragraphs;")
    md.append("element-rotation for vectors: 10k vs 100k, k grown with n so avg")
    md.append("cluster stays ~200). local[16], warmed JVM, shuffle bytes from the")
    md.append("status API. Claim: walls/shuffle grow ~linearly; classifier_train")
    md.append("iteration cost ~flat past the capped sample (only the feature-build")
    md.append("scan grows); semantic_dedup's broadcast argmax assignment is the")
    md.append("documented O(n*k) term (at real scale the assignment itself is")
    md.append("IVF-accelerated; the pair stage stays linear at fixed cluster size).")
    md.append("")
    md.append("| op | reps | out rows | wall s | shuffle bytes |")
    md.append("|---|---|---|---|---|")
    for op, reps, n, wall, sh in rows:
        md.append(f"| {op} | {reps}x | {n:,} | {wall} | {sh:,} |")
    md.append("")
    by_op: dict[str, list] = {}
    for op, reps, n, wall, sh in rows:
        key = op.split(" ")[0]
        by_op.setdefault(key, []).append((reps, wall, sh))
    md.append("| op | wall 10x/1x | shuffle 10x/1x |")
    md.append("|---|---|---|")
    for op, vals in by_op.items():
        if len(vals) == 2:
            (r1, w1, s1), (r2, w2, s2) = sorted(vals)
            md.append(
                f"| {op} | {w2 / w1:.1f}x | {s2 / max(s1, 1):.1f}x |"
            )
    import datetime as dt

    md.append("")
    md.append(f"Run: {dt.datetime.now(dt.timezone.utc).isoformat()} — `python BENCH/newops_scale.py`.")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "NEWOPS2.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
