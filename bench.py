"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric (BASELINE.json): frontier URLs scheduled + sidecar-annotated
per second — measured by the flagship pipeline (filters -> digest dedup ->
vectorized detectors) plus the frontier scheduling window over the same rows.
Per-query wall times for the operator inventory ride along in "queries".

Scaling evidence (north rule N8) is produced by BENCH/scaling.py, which runs
this same job at local[8] and local[32] and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from warc_metadata_sidecar_spark import driver_queries  # noqa: E402
from warc_metadata_sidecar_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# --- external-load gate (VERDICT r5 #1): the headline number must not ride
# co-tenant weather. Same /proc/stat probe as BENCH/scaling.py (duplicated:
# BENCH/ is not a package and bench.py must stay a standalone entry point);
# probe values are RECORDED in the output JSON so a contaminated run is
# visible in the artifact, and the throughput segment retries until its
# before/after probes are both quiet.
IDLE_THRESHOLD = float(os.environ.get("BENCH_IDLE_THRESHOLD", "1.5"))


def busy_cores(interval: float = 0.5) -> float:
    """Busy cores over `interval` from /proc/stat (whole host)."""
    def snap():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = list(map(int, parts))
        return sum(vals), vals[3] + vals[4]  # total, idle+iowait

    t1, i1 = snap()
    time.sleep(interval)
    t2, i2 = snap()
    dt, di = t2 - t1, i2 - i1
    ncpu = os.cpu_count() or 32
    return 0.0 if dt == 0 else (1.0 - di / dt) * ncpu


def wait_idle(threshold: float = IDLE_THRESHOLD, tries: int = 12, pause: float = 10.0) -> float:
    """Block (bounded) until the host reads < `threshold` busy cores;
    returns the last probe. Bounded so the driver's per-round bench can
    never hang on a persistently loud host — the recorded probe then
    documents the contamination instead."""
    b = busy_cores()
    for _ in range(tries):
        if b < threshold:
            return b
        time.sleep(pause)
        b = busy_cores()
    return b

# headline subset: one per operator family (full inventory in queries())
HEADLINE = [
    "sidecar_filters",
    "digest_dedup",
    "sidecar_counters",
    "cdxj_merge_counts",
    "frontier_schedule",
    "url_seen_antijoin",
    "politeness_budget",
    "tpch_q1",
    "revenue_by_nation",
    "top_events_per_type",
    "sessionize_events",
    "dedup_exact",
    "corpus_curation",
    "pii_scrub",
    "benchmark_contamination",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "lang_id_markers",
    "fingerprint_winnow",
    "embedding_cosine_pairs",
    "ann_ivf_top1",
    "ann_ivf_centroid_top1",
    "dedup_cosine_srp",
    "url_seen_sharded",
    "url_seen_bucketed",
    "flagship_sidecar",
    "flagship_counters",
]


def main() -> None:
    # gate BEFORE the JVM exists: this probe sees only external load
    probe_start = round(wait_idle(), 2)
    spark = build_session(app_name="bench", cpus=CPUS, shuffle_partitions=CPUS)
    qs = driver_queries.queries()
    driver_queries.register_views(spark, SF_DIR)

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        _ = n
    probe_queries_end = round(busy_cores(), 2)

    # north-star throughput: URLs scheduled + annotated per second, measured
    # on a 40x deterministic replication of the documents table (~200k rows
    # at sf0.1) so fixed job overhead doesn't dominate — each replica gets a
    # distinct digest/url, so the detector stage does real per-distinct work.
    from pyspark.sql import functions as F

    from warc_metadata_sidecar_spark.frontier.canonical import canonicalize
    from warc_metadata_sidecar_spark.frontier.scheduler import select_round
    from warc_metadata_sidecar_spark.operators.sidecar import sidecar_rows
    from warc_metadata_sidecar_spark import gen

    base = driver_queries.engine_documents_from_driver_tables(spark, SF_DIR)
    n_docs = base.count()
    reps = spark.range(40).select(F.col("id").alias("rep"))
    big = (
        base.crossJoin(reps)
        .withColumn("doc_id", F.concat_ws("-", "doc_id", "rep"))
        .withColumn(
            "payload_digest",
            F.when(
                F.col("payload_digest").isNotNull(),
                F.concat_ws("-", "payload_digest", "rep"),
            ),
        )
        .withColumn("url", F.concat(F.col("url"), F.lit("?r="), F.col("rep")))
        .drop("rep")
        .repartition(2 * CPUS)
    )
    # materialize to parquet, not localCheckpoint: production documents are
    # table-backed, and a stats-less RDD frame forces worst-case join
    # planning (the rep semi-join plans SMJ and AQE can only convert to
    # broadcast AFTER the payload side is shuffle-written; with parquet
    # stats the planner broadcasts the rep side up front — measured 3.5s vs
    # 2.9s on this segment). The write is outside the timed passes.
    import atexit
    import shutil
    import tempfile

    big_dir = tempfile.mkdtemp(prefix="bench_docs_")
    atexit.register(shutil.rmtree, big_dir, True)
    big_path = os.path.join(big_dir, "documents")
    big.write.mode("overwrite").parquet(big_path)
    big = spark.read.parquet(big_path)
    n_big = big.count()
    robots = gen.robots(spark, 50)

    def one_pass() -> tuple[int, int, float]:
        t0 = time.time()
        n_annotated = sidecar_rows(big).count()
        frontier = canonicalize(
            big.filter(~F.col("url").startswith("dns:")).select(
                "url",
                F.lit(None).cast("string").alias("canonical_url"),
                F.lit(None).cast("string").alias("host"),
                F.lit(None).cast("int").alias("host_salt"),
                F.lit(None).cast("double").alias("priority"),
                F.lit(0).alias("discovery_round"),
                F.lit(0).cast("long").alias("seq"),
                F.lit(None).cast("string").alias("parent_url"),
            )
        )
        n_scheduled = select_round(frontier, robots).count()
        return n_annotated, n_scheduled, time.time() - t0

    one_pass()  # warmup (python workers + JIT)
    # idle-gated measurement (VERDICT r5 #1): a pass only counts when the
    # host probes quiet BEFORE it starts; up to 3 attempts, best-of the
    # clean pairs (two passes per attempt like before). All probes are
    # recorded — if the host never settles, the artifact says so.
    attempts: list[dict] = []
    annotated = scheduled = 0
    dt = float("inf")
    clean = False
    for _ in range(3):
        probe_before = round(wait_idle(), 2)
        a1, s1, d1 = one_pass()
        a2, s2, d2 = one_pass()
        probe_after = round(busy_cores(), 2)
        quiet = probe_before < IDLE_THRESHOLD and probe_after < IDLE_THRESHOLD
        attempts.append(
            {"probe_before": probe_before, "probe_after": probe_after,
             "sec": [round(d1, 3), round(d2, 3)], "quiet": quiet}
        )
        best = (a1, s1, d1) if d1 <= d2 else (a2, s2, d2)
        if quiet:
            if not clean or best[2] < dt:
                annotated, scheduled, dt = best
            clean = True
            break
        if not clean and best[2] < dt:
            annotated, scheduled, dt = best
    urls_per_sec = round((annotated + scheduled) / dt, 2)

    total = round(sum(times.values()) + dt, 3)
    print(
        json.dumps(
            {
                "metric": "frontier URLs scheduled+sidecar-annotated per second",
                "value": urls_per_sec,
                "unit": "urls/sec",
                "queries": times,
                "sf": SF_DIR,
                "cpus": CPUS,
                "n_docs": n_docs,
                "throughput_rows": n_big,
                "annotated": annotated,
                "scheduled": scheduled,
                "throughput_sec": round(dt, 3),
                "total_sec": total,
                # idle-gate evidence (VERDICT r5 #1): probes in busy cores
                "idle_threshold": IDLE_THRESHOLD,
                "probe_start": probe_start,
                "probe_queries_end": probe_queries_end,
                "throughput_attempts": attempts,
                "throughput_quiet": clean,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
