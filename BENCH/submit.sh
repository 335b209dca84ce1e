#!/usr/bin/env bash
# North-rule deployment shape: the same job via spark-submit --py-files on a
# real multi-executor cluster. In the sandbox, master is local[N]; on a
# cluster, swap --master for yarn/k8s and size executors — the code paths
# are identical (session.py only changes master/memory knobs).
#
# Usage: BENCH/submit.sh [cpus] [input_dir]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CPUS="${1:-8}"
INPUT="${2:-/tmp/scale_docs_2000000}"

ZIP="/tmp/warc_metadata_sidecar_spark.zip"
(cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" warc_metadata_sidecar_spark)

exec spark-submit \
  --master "local[$CPUS]" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions=$((2 * CPUS)) \
  "$REPO/BENCH/scale_job.py" "$CPUS" "$INPUT"
