#!/bin/bash
# Launch a graft main with the exact JVM options sbt's forked `run` uses
# (build.sbt jdk17AddOpens + UTC + heap), but WITHOUT sbt's startup load:
# sbt -batch burns ~40 s of CPU before the main starts, which pushes the
# 1-minute loadavg the Bench main samples as `load_ambient` to ~0.9 on an
# otherwise idle host — indistinguishable from real contamination, and
# BenchGuard (correctly) refuses the record. A flat-classpath java launch
# reads the HOST's ambient, which is the thing the protocol gates on.
# Classpath: refresh /tmp/graft_cp.txt after dependency changes with
#   sbt -batch "export Runtime/fullClasspath" | tail -1 > /tmp/graft_cp.txt
# (code changes only need `sbt -batch compile` — the classpath is stable).
set -euo pipefail
CP_FILE="${GRAFT_CP_FILE:-/tmp/graft_cp.txt}"
[ -s "$CP_FILE" ] || { echo "classpath file $CP_FILE missing; run: sbt -batch 'export Runtime/fullClasspath' | tail -1 > $CP_FILE" >&2; exit 2; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MAT_OPTS=""
[ -n "${SPARK_GRAFT_MATERIALIZE:-}" ] && MAT_OPTS="-Dspark.graft.materialize=$SPARK_GRAFT_MATERIALIZE"
[ -n "${SPARK_GRAFT_MATERIALIZE_DIR:-}" ] && MAT_OPTS="$MAT_OPTS -Dspark.graft.materialize.dir=$SPARK_GRAFT_MATERIALIZE_DIR"
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  $MAT_OPTS \
  -cp "$(cat "$CP_FILE")" "$@"
