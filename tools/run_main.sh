#!/bin/bash
# Run a graft main via plain java against an explicit classes dir — no sbt,
# no project lock, so dev compiles and long benchmark sweeps can overlap.
# Mirrors build.sbt's forked-JVM options (JDK17 add-opens, UTC, no UI).
# The r16 GC-pinning trio (-Xms=-Xmx, AlwaysPreTouch, ParallelRefProc)
# was A/B'd on full bench runs and REMOVED again — see build.sbt: the
# GC-storm it targeted is fixed at its source (covariance moment
# kernels), and the fixed 8 GB young gen measurably costs throughput.
# Both run paths deliberately agree on the plain -Xmx-only JVM.
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
  -cp "$CLASSES:/opt/spark/jars/*" "$MAIN" "$@"
