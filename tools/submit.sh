#!/usr/bin/env bash
# Package the engine and submit the validation job via spark-submit
# --py-files (north-rule deployment shape).  Locally this runs against
# local[N]; on a cluster, point --master at YARN/K8s and size the
# executors — the job code is identical.
#
# Usage: tools/submit.sh <input-parquet> <output-dir> [extra job args...]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
INPUT="${1:?input documents parquet}"
OUTPUT="${2:?output dir}"
shift 2 || true

ZIP="$(mktemp -d)/gwv_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" gwv_spark -x '*__pycache__*')

CPUS="${SPARK_GRAFT_CPUS:-32}"
exec spark-submit \
  --master "local[${CPUS}]" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions="${CPUS}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  "$REPO/gwv_spark/job.py" \
  --input "$INPUT" --output "$OUTPUT" "$@"
