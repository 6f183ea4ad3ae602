#!/bin/bash
# Run a graft main class against the compiled classes + /opt/spark/jars
# without going through sbt (avoids sbt server lock; same JVM flags as
# build.sbt's run/fork settings).
# Usage: tools/run_main.sh graft.Bench [args...]
set -e
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# heap handling mirrors build.sbt: cap at 16g, 50ms G1 pause target.
# SPARK_GRAFT_MEM_RAW bypasses the cap for resources-proportional-to-data
# tier experiments (sf10 on one JVM = 100x sf0.1's data in sf0.1's heap;
# the 100 TB contract scales executor count with data instead).
MEM="${SPARK_DRIVER_MEM:-8g}"
if [ -n "${SPARK_GRAFT_MEM_RAW:-}" ]; then
  MEM="$SPARK_GRAFT_MEM_RAW"
elif [[ "$MEM" =~ ^([0-9]+)[gG]$ ]] && [ "${BASH_REMATCH[1]}" -gt 16 ]; then
  MEM=16g
fi
exec java $ADD_OPENS $EXTRA_JAVA_OPTS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" -XX:MaxGCPauseMillis=50 \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
