#!/usr/bin/env bash
# spark-submit launcher for the graft engine — the north rule's deployment
# form. Packages the library jar and submits the requested main class to a
# Spark master (default local[32]; on a real cluster pass e.g.
# --master spark://host:7077 or yarn, and size --num-executors there).
#
# Usage:
#   tools/submit.sh [MASTER] [MAIN] [ARGS...]
#     MASTER  Spark master URL            (default: local[32])
#     MAIN    main class to run           (default: graft.Bench)
#     ARGS    passed through to the main
#
# Examples:
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 tools/submit.sh 'local[8]'
#   tools/submit.sh 'local[8]' graft.Verify /root/testdata/sf0.01 /tmp/out
#   tools/submit.sh 'local[8]' graft.tools.StreamSmoke /tmp/smoke
#
# The two-cluster-size scaling protocol (N vs 4N) is this script invoked
# twice: tools/submit.sh 'local[8]' ... then tools/submit.sh 'local[32]' ...
# — the same binary, same input; BENCH/BASELINE.md reports throughput at
# both levels and the efficiency between them.
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${1:-local[32]}"
MAIN="${2:-graft.Bench}"
shift $(( $# > 2 ? 2 : $# )) || true

SPARK_HOME="${SPARK_HOME:-/opt/spark}"
export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"

sbt -batch package > /dev/null
JAR=$(ls target/scala-2.13/dataflowjoinspark_*.jar | head -1)

exec "$SPARK_HOME/bin/spark-submit" \
  --master "$MASTER" \
  --class "$MAIN" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.session.timeZone=UTC \
  --driver-memory 8g \
  "$JAR" "$@"
