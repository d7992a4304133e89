#!/usr/bin/env bash
# spark-submit launcher (north rule: `spark-submit --py-files` at N and 4N
# executors; local[N] is the sandbox proxy for an N-executor cluster).
#
#   scripts/submit.sh <cores> [run_job.py args...]
set -euo pipefail
CORES="${1:?usage: submit.sh <cores> [args...]}"; shift
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
DIST="$ROOT/dist"; mkdir -p "$DIST"
ZIP="$DIST/satellitetools_spark.zip"
(cd "$ROOT" && rm -f "$ZIP" && zip -qr "$ZIP" satellitetools_spark -x '*__pycache__*')
exec spark-submit \
  --master "local[$CORES]" \
  --conf spark.sql.shuffle.partitions="$((2 * CORES))" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$ZIP" \
  "$ROOT/scripts/run_job.py" "$@"
