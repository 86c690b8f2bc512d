#!/usr/bin/env bash
# Cluster deployment template (north rule: spark-submit --py-files on a
# multi-executor cluster). The same CdcPipeline code runs unchanged; only the
# master / executor topology differs from the sandbox's local mode.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
python "$REPO/scripts/package.py"

exec spark-submit \
  --master "${SPARK_MASTER:-yarn}" \
  --deploy-mode cluster \
  --num-executors "${NUM_EXECUTORS:-250}" \
  --executor-cores 4 \
  --executor-memory 16g \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-2000}" \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.executorEnv.OMP_NUM_THREADS=1 \
  --conf spark.executorEnv.OPENBLAS_NUM_THREADS=1 \
  --py-files "$REPO/dist/changedatacapture_spark.zip" \
  "$REPO/scripts/run_pipeline.py" "$@"
