#!/bin/bash
# Scale-tier sweep: fresh JVM per query (r7 verdict — the combined
# multi-query run accumulates checkpoint/shuffle blocks faster than the
# scratch disk drains; fresh JVMs isolate each row), graft.Bench's own
# 1-warmup + min-of-3 + storm-gate per query.
# Usage: tools/tier_sweep.sh <sfDir> <outDir> <query...>
set -u
SFDIR="$1"; OUT="$2"; shift 2
mkdir -p "$OUT"
for q in "$@"; do
  echo "=== $q @ $SFDIR $(date +%H:%M:%S)" >&2
  # Per-run scratch dir so post-run hygiene can't clobber a CONCURRENT
  # Spark process's /tmp/spark-*/blockmgr-* dirs (r8 advice).
  RUNTMP="$(mktemp -d /tmp/graft-tier-XXXXXX)"
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_SKIP_OBJ=1 \
  SPARK_GRAFT_SKIP_LAYOUT=1 SPARK_GRAFT_MAX_ATTEMPTS=1 \
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  EXTRA_JAVA_OPTS="${EXTRA_JAVA_OPTS:-} -Dspark.local.dir=$RUNTMP -Djava.io.tmpdir=$RUNTMP" \
    "$(dirname "$0")/run_main.sh" graft.Bench "$q" \
    > "$OUT/$q.out" 2> "$OUT/$q.err"
  rc=$?   # capture the BENCH run's status before any bookkeeping (r8 advice:
          # the old 'exit $?' reported the status of the cp below)
  cp BENCH_DETAIL.json "$OUT/$q.detail.json" 2>/dev/null
  echo "exit $rc $(tail -c 400 "$OUT/$q.out")" >&2
  # fresh-JVM hygiene, scoped to THIS run's scratch only
  rm -rf "$RUNTMP" 2>/dev/null
done
echo "=== sweep done $(date +%H:%M:%S)" >&2
