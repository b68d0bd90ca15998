#!/bin/sh
# spark-submit packaging for multi-executor clusters (the north-rule launch
# path). Locally the same entry runs on local[N]; on a cluster pass your
# master/deploy-mode and executor sizing.
#
#   ./bench/submit.sh [extra spark-submit args...]
#
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
rm -f /tmp/deusu_spark.zip
python -m zipfile -c /tmp/deusu_spark.zip deusu_spark/
exec spark-submit \
  --py-files /tmp/deusu_spark.zip \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$@" \
  "$REPO/bench.py"
