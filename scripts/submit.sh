#!/usr/bin/env bash
# Package the engine and launch the flagship job via spark-submit --py-files.
# SPARK_MASTER defaults to local[$SPARK_GRAFT_CPUS]; on a real cluster set
# e.g. SPARK_MASTER=yarn or spark://host:7077.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/pic2vec_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" pic2vec_spark -x '*__pycache__*')

MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
SPARK_SUBMIT="$(python -c 'import pyspark, pathlib; print(pathlib.Path(pyspark.__file__).parent / "bin" / "spark-submit")')"

exec "$SPARK_SUBMIT" \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  "$REPO/scripts/run_job.py" "$@"
