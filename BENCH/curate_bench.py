"""curate CLI end-to-end bench (VERDICT r6 task 8): one sf0.1 run composing
exact dedup -> paragraph dedup -> Gopher + C4 gates -> DSIR top-K ->
temperature sample -> shard write + manifest, with wall + per-stage rows
and the manifest checksum re-verified against an independent twin
(shard_manifest over the parquet actually written).

Input: the sf0.1 documents table, rewritten deterministically OUTSIDE the
timed run so every stage does real work on this synthetic corpus —
3-paragraph structure (two content slices + a shared boilerplate footer on
1/3 of docs, the newops_scale shape), a stopword-bearing compliant
sentence appended (the raw synthetic vocabulary has no English stopwords,
so the Gopher gate would otherwise drop 100% — COVERAGE.md), and 10% of
docs re-entered as exact duplicates under high ids (dedup-stage food).

Run: python BENCH/curate_bench.py   ->  BENCH/CURATE.md numbers
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from warc_metadata_sidecar_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

COMPLIANT = (
    " The record is kept with care and that is of interest to the reader."
    " It should be enough to have the gates measure selectivity as well."
)


def prepare(spark, path: str) -> int:
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ws = base.withColumn("ws", F.split("text", " "))
    docs = ws.select(
        "doc_id",
        "lang",
        F.concat(
            F.concat_ws(" ", F.slice("ws", 1, 12)),
            F.lit("." + COMPLIANT + "\n"),
            F.concat_ws(" ", F.slice("ws", 13, 12)),
            F.lit("." + COMPLIANT),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("\nshared boilerplate footer paragraph for one third."),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    dups = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 50_000_000
    )
    full = docs.unionByName(dups)
    full.write.mode("overwrite").parquet(path)
    return full.count()


def main() -> None:
    work = tempfile.mkdtemp(prefix="curate_bench_")
    docs_path = os.path.join(work, "docs")
    out_dir = os.path.join(work, "out")
    spark = build_session("curate-bench-prep", cpus=CPUS, shuffle_partitions=CPUS)
    n_in = prepare(spark, docs_path)
    spark.stop()

    cmd = [
        sys.executable, "-m", "warc_metadata_sidecar_spark.cli",
        "--cpus", str(CPUS),
        "curate", docs_path, out_dir,
        "--shards", "8", "--paragraph-dedup", "--gopher", "--c4",
        "--dsir-k", "2000", "--budget", "1500",
    ]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    wall = round(time.time() - t0, 1)
    out = proc.stdout.replace("\r", "\n")
    stage = re.search(
        r"read=(\d+) after_blocklist=\d+ after_dedup=(\d+) after_quality=(\d+) written=(\d+) tokens=(\d+)",
        out,
    )
    shards = re.findall(r"shard=(\d+) docs=(\d+) tokens=(\d+) checksum=(-?\d+)", out)
    if not stage or proc.returncode != 0:
        print(out[-3000:])
        print(proc.stderr[-3000:])
        raise SystemExit("curate run failed")

    # twin verify: recompute the manifest from the files actually written
    spark = build_session("curate-bench-verify", cpus=8, shuffle_partitions=8)
    from warc_metadata_sidecar_spark.operators.shards import shard_manifest

    written = spark.read.parquet(os.path.join(out_dir, "curated"))
    twin = {
        int(r["shard"]): (int(r["n_docs"]), int(r["n_tokens"]), int(r["checksum"]))
        for r in shard_manifest(
            written.select("doc_id", "text"), n_shards=8
        ).collect()
    }
    printed = {int(s): (int(d), int(t), int(c)) for s, d, t, c in shards}
    checks_ok = printed == twin
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)

    summary = {
        "input_rows": n_in,
        "wall_s": wall,
        "read": int(stage.group(1)),
        "after_dedup": int(stage.group(2)),
        "after_quality": int(stage.group(3)),
        "written": int(stage.group(4)),
        "tokens": int(stage.group(5)),
        "n_shards": len(printed),
        "manifest_twin_match": checks_ok,
    }
    print("CURATE_SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
