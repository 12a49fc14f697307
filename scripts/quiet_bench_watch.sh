#!/bin/bash
# Watch for a quiet tunnel window and run the full bench once for the
# record (VERDICT r2 #10 / ROADMAP round-4 #1).  Probes every 15 min via
# `bench.py probe`; when the ceiling clears IUNET_BENCH_QUIET_TFLOPS
# (default 5), runs the full bench and stores the log under
# docs/bench_logs/.  Exits after one successful run or when the deadline
# (arg 1, seconds, default 8h) lapses.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-28800}
THRESH=${IUNET_BENCH_QUIET_TFLOPS:-5}
mkdir -p docs/bench_logs
START=$(date +%s)
while true; do
  NOW=$(date +%s)
  if [ $((NOW - START)) -ge "$DEADLINE" ]; then
    echo "[watch] deadline lapsed without a quiet window" ; exit 1
  fi
  if [ -f /tmp/iunet_tpu_busy ]; then
    echo "[watch] session is using the TPU (flag file) — skipping probe"
    sleep 300; continue
  fi
  LINE=$(timeout 600 python bench.py probe 2>/dev/null | tail -1)
  CEIL=$(echo "$LINE" | python -c "import sys,json;print(json.load(sys.stdin).get('value',0))" 2>/dev/null || echo 0)
  echo "[watch] $(date -u +%H:%M:%S) ceiling=$CEIL TFLOP/s"
  OK=$(python -c "print(1 if float('$CEIL' or 0) >= float('$THRESH') else 0)")
  if [ "$OK" = "1" ]; then
    TS=$(date -u +%Y%m%dT%H%M%S)
    LOG=docs/bench_logs/quiet_${TS}.log
    echo "[watch] quiet window — running full bench -> $LOG"
    touch /tmp/iunet_tpu_busy
    timeout 3600 python bench.py >"$LOG" 2>&1
    RC=$?
    rm -f /tmp/iunet_tpu_busy
    echo "[watch] bench exit $RC"
    if [ $RC -eq 0 ]; then exit 0; fi
    # bench failed (tunnel drop mid-run etc.) — keep the log, keep waiting
  fi
  sleep 900
done
