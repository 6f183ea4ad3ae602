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
# heap handling mirrors build.sbt: cap at 16g, 50ms G1 pause target
MEM="${SPARK_DRIVER_MEM:-8g}"
if [[ "$MEM" =~ ^([0-9]+)[gG]$ ]] && [ "${BASH_REMATCH[1]}" -gt 16 ]; then
  MEM=16g
fi
exec java $ADD_OPENS $EXTRA_JAVA_OPTS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" -XX:MaxGCPauseMillis=50 \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
