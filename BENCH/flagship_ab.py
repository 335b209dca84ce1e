"""A/B for VERDICT r6 task 4: name the flagship_sidecar 2.03x (r5 2.68s ->
r6 5.42s at sf0.1).

Design: the r6 code delta in this query is the charset_head seam
(operators/sidecar.py adds a NULL binary column into the Arrow detector
batch on driver tables, which carry no charset_head) plus the r6 detector
ladder additions that run per representative row (ISO-2022 escape rungs on
the decoded path, sjis/GBK guards). Driver tables have NO charset_head
column, so "column present vs dropped" alone is a no-op — the honest A/B
is the CURRENT modules vs the EXACT r5 modules (commit f4d8f06), run
interleaved in alternating subprocesses on the same host minute, each
idle-gated with the bench calibrations recorded.

Subprocess-per-variant is load-bearing: pandas UDFs in importable modules
pickle BY REFERENCE, so local-mode Python workers import their own copy of
the package — a same-process module swap would silently run the current
UDFs under the r5 label. Each child sets PYTHONPATH to its tree so driver
and workers agree.

Usage:
  git archive f4d8f06 warc_metadata_sidecar_spark | (mkdir -p /tmp/r5repo && tar -x -C /tmp/r5repo)
  python BENCH/flagship_ab.py            # writes walls JSON to stdout

Results land in BENCH/FLAGSHIP_AB.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from bench import calib_parallel_sec, calib_sec, wait_idle  # noqa: E402

R7_ROOT = "/root/repo"
R5_ROOT = "/tmp/r5repo"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAIRS = int(os.environ.get("AB_PAIRS", "3"))

CHILD = r"""
import json, os, sys, time
root, sf, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
sys.path.insert(0, root)
from warc_metadata_sidecar_spark.session import build_session
from warc_metadata_sidecar_spark import driver_queries as dq
spark = build_session("flagship-ab", cpus=cpus, shuffle_partitions=cpus)
dq.flagship_sidecar(spark, sf).count()  # warmup: codegen + parquet footer cache
walls = []
for _ in range(2):
    t0 = time.time()
    dq.flagship_sidecar(spark, sf).count()
    walls.append(round(time.time() - t0, 3))
print("AB_RESULT " + json.dumps({"root": root, "walls": walls}))
spark.stop()
"""


def run_child(root: str) -> list[float]:
    env = dict(os.environ)
    env["PYTHONPATH"] = root
    out = subprocess.run(
        [sys.executable, "-c", CHILD, root, SF_DIR, str(CPUS)],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])["walls"]
    raise RuntimeError(f"child failed for {root}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    rows = []
    for i in range(PAIRS):
        for label, root in (("r7", R7_ROOT), ("r5", R5_ROOT)):
            probe = round(wait_idle(), 2)
            cal1 = round(calib_sec(), 3)
            calp = round(calib_parallel_sec(), 3)
            walls = run_child(root)
            rows.append(
                {
                    "pair": i,
                    "variant": label,
                    "probe": probe,
                    "calib_sec": cal1,
                    "calib_par_sec": calp,
                    "walls": walls,
                }
            )
            print(json.dumps(rows[-1]), flush=True)
    med = {
        v: sorted(w for r in rows if r["variant"] == v for w in r["walls"])
        for v in ("r7", "r5")
    }

    def median(xs):
        n = len(xs)
        return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2

    summary = {
        "median_r7": round(median(med["r7"]), 3),
        "median_r5": round(median(med["r5"]), 3),
        "ratio_r7_over_r5": round(median(med["r7"]) / median(med["r5"]), 3),
        "rows": rows,
    }
    print("AB_SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
