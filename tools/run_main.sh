#!/bin/bash
# Run a graft main via plain java against an explicit classes dir — no sbt,
# no project lock, so dev compiles and long benchmark sweeps can overlap.
# Mirrors build.sbt's forked-JVM options (JDK17 add-opens, UTC, no UI).
# Heap is fixed-size and pre-touched (round-16 variance work): -Xms=-Xmx
# removes G1 heap-resize churn across ~680 query executions per bench run,
# AlwaysPreTouch pays the page-fault cost once at JVM start (outside any
# timed pass) instead of smearing it over the first queries, and parallel
# reference processing drains Spark's weak-ref load without long remark
# pauses. All three shrink run-to-run spread, none move the floor.
# Usage: GRAFT_CLASSES=/path/to/classes tools/run_main.sh graft.Bench [args...]
set -euo pipefail
CLASSES="${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}"
MAIN="$1"; shift
exec java \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  "-Xms${SPARK_DRIVER_MEM:-8g}" \
  -XX:+AlwaysPreTouch \
  -XX:+ParallelRefProcEnabled \
  -cp "$CLASSES:/opt/spark/jars/*" "$MAIN" "$@"
