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


def calib_sec() -> float:
    """Single-thread CPU calibration: wall of a FIXED arithmetic loop —
    a direct effective-frequency proxy. /proc/stat cannot see
    hypervisor-level frequency throttling (observed: two quiet-probed
    runs 30 min apart, zero code delta, every query +20% and pass walls
    DEGRADING within one attempt); this catches it. Recorded per attempt
    in the JSON; an attempt whose calibration is >25% slower than the
    session's best is retried like a loud-probe attempt."""
    t0 = time.time()
    s = 0
    for i in range(10_000_000):
        s += i * i
    _ = s
    return time.time() - t0


def _burn(k: int) -> int:
    s = 0
    for i in range(k):
        s += i * i
    return s


def calib_parallel_sec(procs: int = 8) -> float:
    """Parallel CPU calibration: wall of a fixed 8-process burn. Catches
    power-cap throttle modes a single-thread probe misses."""
    import multiprocessing as mp

    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(_burn, [4_000_000] * procs)
    return time.time() - t0


def _stat_vals() -> list[int]:
    return list(map(int, open("/proc/stat").readline().split()[1:]))


def _tree_jiffies() -> int:
    """utime+stime of this process tree (JVM + python workers) — what the
    bench itself burned. Same accounting as BENCH/scale_job.py."""
    total = 0
    me = os.getpid()
    parents: dict[int, int] = {}
    stats: dict[int, tuple[int, int]] = {}
    for pid_dir in os.listdir("/proc"):
        if not pid_dir.isdigit():
            continue
        try:
            with open(f"/proc/{pid_dir}/stat") as f:
                parts = f.read().rsplit(") ", 1)[-1].split()
            parents[int(pid_dir)] = int(parts[1])
            stats[int(pid_dir)] = (int(parts[11]), int(parts[12]))
        except (OSError, ValueError, IndexError):
            continue
    mine = {me}
    changed = True
    while changed:
        changed = False
        for pid, ppid in parents.items():
            if pid not in mine and ppid in mine:
                mine.add(pid)
                changed = True
    for pid in mine:
        u, s = stats.get(pid, (0, 0))
        total += u + s
    return total


def run_measured(run):
    """Run `run()`; return (result, wall, steal_cores, ext_cores,
    own_cores) — in-run attribution the before/after probes cannot see:
    hypervisor steal, same-VM co-tenant busy (host minus our tree), and
    our own sustained parallelism (own << cpus with a long wall = the
    scheduler starved us, not the plan)."""
    hz = os.sysconf("SC_CLK_TCK")
    v0, o0, t0 = _stat_vals(), _tree_jiffies(), time.time()
    result = run()
    v1, o1, t1 = _stat_vals(), _tree_jiffies(), time.time()
    wall = max(t1 - t0, 1e-9)
    # /proc/stat jiffies are summed across cpus: delta/hz/wall = avg cores
    steal = (v1[7] - v0[7]) / hz / wall
    host_busy = (sum(v1) - v1[3] - v1[4]) - (sum(v0) - v0[3] - v0[4])
    own = (o1 - o0) / hz / wall
    ext = max(0.0, host_busy / hz / wall - own)
    return result, t1 - t0, round(steal, 2), round(ext, 2), round(own, 2)


def calib_mem_sec() -> float:
    """Memory-BANDWIDTH calibration: time numpy copies over a 256 MB
    buffer. The decisive probe for this host: measured passes where the
    same Spark work burned 2.2x the core-seconds at near-zero steal and
    quiet neighbors — busy vCPUs retiring fewer instructions, i.e.
    shared-host memory/SMT contention. ALU-bound burns can't see it;
    streaming copies can."""
    import numpy as np

    a = np.ones(32 * (1 << 20), dtype=np.float64)  # 256 MB
    t0 = time.time()
    for _ in range(4):
        b = a.copy()
        a[0] = b[1]
    return time.time() - t0


def calib_io_sec(mb: int = 64) -> float:
    """Disk IO calibration: write+fsync+read a fixed buffer in the shuffle
    tmpdir. This VM's storage is a shared-host virtio device — observed
    runs where BOTH CPU calibs were fast while IO-heavy Spark passes ran
    50% slow; this probe is the attribution for that mode."""
    import tempfile

    buf = b"\xa5" * (1 << 20)
    t0 = time.time()
    with tempfile.NamedTemporaryFile(dir="/tmp") as f:
        for _ in range(mb):
            f.write(buf)
        f.flush()
        os.fsync(f.fileno())
        f.seek(0)
        while f.read(1 << 22):
            pass
    return time.time() - t0

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
    "lm_perplexity",
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


# r6-continuation operators, timed in a SEPARATE section so the HEADLINE
# set (and total_sec) stays comparable across rounds
EXTENDED = [
    "stratified_sample",
    "temperature_sample",
    "pack_chunked",
    "pack_greedy",
    "gopher_quality",
    "c4_filters",
    "classifier_score",
    "shard_manifest",
    "ccnet_buckets",
    "bpe_token_counts",
    "ann_pq_top1",
    "paragraph_dedup",
    "semantic_dedup",
    "dsir_select",
    "classifier_train",
    "top_ngrams",
    "sitemap_discovery",
    # r7 operators
    "boilerplate_lines",
    "bm25_score",
    "hard_negatives",
    "pagerank_hosts",
    "containment_pairs",
    "tfidf_keywords",
    # r7 session-2 operators
    "anchor_texts",
    "lm_backoff",
    "embedding_sq",
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
    times_ext: dict[str, float] = {}
    for name in EXTENDED:
        fn = qs[name]
        t0 = time.time()
        _ = fn(spark, SF_DIR).count()
        times_ext[name] = round(time.time() - t0, 3)
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
    best_calib = best_calib_io = best_calib_mem = float("inf")
    for _ in range(4):
        probe_before = round(wait_idle(), 2)
        cal1 = round(calib_sec(), 3)
        cal = round(calib_parallel_sec(), 3)
        cal_io = round(calib_io_sec(), 3)
        cal_mem = round(calib_mem_sec(), 3)
        best_calib = min(best_calib, cal)
        best_calib_io = min(best_calib_io, cal_io)
        best_calib_mem = min(best_calib_mem, cal_mem)
        # three timed passes (JIT/page-cache convergence takes more than
        # one warmup on this host), each with in-run attribution
        passes = []
        for _ in range(3):
            (a, s, d), _w, stl, ext, own = run_measured(one_pass)
            passes.append((a, s, d, stl, ext, own))
        probe_after = round(busy_cores(), 2)
        throttled = (
            cal > 1.25 * best_calib
            or cal_io > 1.5 * best_calib_io
            or cal_mem > 1.3 * best_calib_mem
        )
        quiet = (
            probe_before < IDLE_THRESHOLD
            and probe_after < IDLE_THRESHOLD
            and not throttled
        )
        attempts.append(
            {"probe_before": probe_before, "probe_after": probe_after,
             "calib_sec": cal1, "calib_par_sec": cal, "calib_io_sec": cal_io,
             "calib_mem_sec": cal_mem,
             "sec": [round(p[2], 3) for p in passes],
             # per-pass in-run attribution: [steal, external-busy, own]
             # avg cores — own << cpus with a long wall means the host
             # starved the job, not the plan
             "in_run_cores": [[p[3], p[4], p[5]] for p in passes],
             "quiet": quiet}
        )
        best = min(passes, key=lambda p: p[2])[:3]
        if quiet:
            if not clean or best[2] < dt:
                annotated, scheduled, dt = best
            clean = True
            break
        if not clean and best[2] < dt:
            annotated, scheduled, dt = best
        time.sleep(20)  # throttle windows pass; give the next attempt air
    urls_per_sec = round((annotated + scheduled) / dt, 2)

    total = round(sum(times.values()) + dt, 3)
    print(
        json.dumps(
            {
                "metric": "frontier URLs scheduled+sidecar-annotated per second",
                "value": urls_per_sec,
                "unit": "urls/sec",
                "queries": times,
                "queries_extended": times_ext,
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
                # CPU calibration (sec for fixed loops): comparable ACROSS
                # rounds — slower calibs with identical code mean the
                # host, not the engine. The parallel calib is the one the
                # retry logic keys on (power-cap throttling binds only
                # under parallel load).
                "calib_par_sec_best": round(best_calib, 3),
                "calib_io_sec_best": round(best_calib_io, 3),
                "calib_mem_sec_best": round(best_calib_mem, 3),
                "throughput_attempts": attempts,
                "throughput_quiet": clean,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
