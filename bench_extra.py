"""Per-query isolation harness for the r08 optimization round (guide §1).

NOT the driver bench (bench.py is frozen): this file exists to
  - time individual queries with the noop sink (guide §1.4) so the
    computation is measured, not the sink or the driver collect;
  - dump .explain("formatted") into plans/r08/<query>_{before,after}.txt;
  - run A/B comparisons while iterating.

Usage:
  python bench_extra.py time  <query> [query...]   # noop-sink wall, 3 reps
  python bench_extra.py plan  <query> <suffix>     # write plans/r08/<q>_<suffix>.txt
  python bench_extra.py sweep                      # noop-sink wall for all bench queries
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from warc_metadata_sidecar_spark import driver_queries  # noqa: E402
from warc_metadata_sidecar_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    spark = build_session(app_name="bench_extra", cpus=CPUS, shuffle_partitions=CPUS)
    qs = driver_queries.queries()
    driver_queries.register_views(spark, SF_DIR)

    if mode == "plan":
        name, suffix = sys.argv[2], sys.argv[3]
        os.makedirs("plans/r08", exist_ok=True)
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"plans/r08/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    elif mode == "time":
        for name in sys.argv[2:]:
            fn = qs[name]
            walls = []
            for _ in range(REPS):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                _noop(fn(spark, SF_DIR))
                walls.append(round(time.time() - t0, 3))
            print(f"{name}: {walls} min={min(walls)}")
    elif mode == "count":
        # bench.py's own sink (.count()) — the driver-graded methodology:
        # count() prunes unreferenced output columns and drops the final
        # sort, so walls here are the ones bench.py actually sees.
        for name in sys.argv[2:]:
            fn = qs[name]
            walls = []
            for _ in range(REPS):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                _ = fn(spark, SF_DIR).count()
                walls.append(round(time.time() - t0, 3))
            print(f"{name}: {walls} min={min(walls)}")
    elif mode == "phases":
        # Cold-cost breakdown per query: construct (driver python + py4j),
        # plan (analysis + optimization + physical planning + AQE prep),
        # execute (count job incl. codegen compile on first run).
        for name in sys.argv[2:]:
            fn = qs[name]
            for rep in range(REPS):
                t0 = time.time()
                df = fn(spark, SF_DIR)
                t1 = time.time()
                df._jdf.queryExecution().executedPlan()
                t2 = time.time()
                _ = df.count()
                t3 = time.time()
                print(
                    f"{name} rep{rep}: construct={t1 - t0:.3f} "
                    f"plan={t2 - t1:.3f} exec={t3 - t2:.3f} total={t3 - t0:.3f}"
                )
    else:  # sweep
        import json

        names = list(dict.fromkeys(
            getattr(__import__("bench"), "HEADLINE") + getattr(__import__("bench"), "EXTENDED")
        ))
        out = {}
        for name in names:
            fn = qs[name]
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            _noop(fn(spark, SF_DIR))
            out[name] = round(time.time() - t0, 3)
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
