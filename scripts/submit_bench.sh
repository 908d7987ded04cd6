#!/usr/bin/env bash
# Run the benchmark through spark-submit with the engine shipped via
# --py-files, exactly as a multi-executor cluster deployment would.
#
#   scripts/submit_bench.sh [master] [sf_dir] [extra spark-submit args...]
#
# Defaults: master=local[$SPARK_GRAFT_CPUS or 32], sf=/root/testdata/sf0.1.
# On a real cluster: scripts/submit_bench.sh yarn s3://bucket/sf100 \
#     --num-executors 250 --executor-cores 4 --executor-memory 16g
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS="${SPARK_GRAFT_CPUS:-32}"
MASTER="${1:-local[$CPUS]}"
SF_DIR="${2:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}"
shift $(( $# > 2 ? 2 : $# )) || true

ZIP=/tmp/louvain_communities_openmp_spark.zip
rm -f "$ZIP"
python - <<EOF
import zipfile, os
with zipfile.ZipFile("$ZIP", "w") as z:
    for root, _, files in os.walk("louvain_communities_openmp_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
EOF

SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$@" \
  bench.py
