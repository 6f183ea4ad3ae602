#!/bin/bash
# Standing per-round full-registry scale screen (r8 verdict #4).
# Generates the sf1 fixture if absent, then runs graft.Screen over the
# whole registry (FixtureDiagnostic rows excluded by the Screen main)
# at ref=sf0.1 vs tgt=sf1 and writes a driver-parseable
# SCREEN_SF1_r<N>.json: per-query ref/tgt wall + ok/flagged/failed/
# timeout status, flagging super-linear rows at tgt > 30 x max(ref,
# 0.5s)  (10x data step x 3 slack — the BlockingGateSpec constant).
# Usage: tools/screen_sf1.sh <outJson> [query...]
set -u
OUT="${1:?usage: screen_sf1.sh <outJson> [query...]}"; shift || true
SF1=${SPARK_GRAFT_SF1_DIR:-/dev/shm/graft_sf1}
if [ ! -d "$SF1" ]; then
  echo "[screen] generating sf1 fixture at $SF1" >&2
  SPARK_GRAFT_CPUS=16 "$(dirname "$0")/run_main.sh" \
    graft.ScaleGen /root/testdata/sf0.1 "$SF1" 10 >&2 || exit 1
fi
RUNTMP="$(mktemp -d /tmp/graft-screen-XXXXXX)"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
EXTRA_JAVA_OPTS="${EXTRA_JAVA_OPTS:-} -Dspark.local.dir=$RUNTMP -Djava.io.tmpdir=$RUNTMP" \
  "$(dirname "$0")/run_main.sh" graft.Screen \
  /root/testdata/sf0.1 "$SF1" "$OUT" "$@"
rc=$?
rm -rf "$RUNTMP" 2>/dev/null
exit $rc
