#!/bin/bash
# Auto-retry the full bench suite until the in-suite sentinel flag reads
# clean (sentinel_ratio <= 1.2 vs tools/sentinel_baseline.json), keeping
# the lowest-sentinel artifact across attempts. The shared VM sees
# co-tenant CPU-steal waves lasting minutes; attempts are therefore
# spaced, not back-to-back. Usage: tools/bench_retry.sh [attempts] [sleep_s]
set -u
cd "$(dirname "$0")/.."
N=${1:-4}
SLEEP=${2:-180}
BEST=999999
for i in $(seq 1 "$N"); do
  echo "[bench_retry] attempt $i/$N $(date -u +%H:%M:%SZ)" >&2
  sbt -batch "runMain graft.Bench" >"/tmp/bench_attempt_$i.out" 2>"/tmp/bench_attempt_$i.err"
  if [ ! -f BENCH_FULL.json ]; then
    echo "[bench_retry] attempt $i produced no BENCH_FULL.json" >&2
    continue
  fi
  RATIO=$(python3 -c "import json;print(json.load(open('BENCH_FULL.json'))['sentinel_ratio'])" 2>/dev/null || echo 999999)
  WINDOW=$(python3 -c "import json;print(json.load(open('BENCH_FULL.json'))['window'])" 2>/dev/null || echo unknown)
  echo "[bench_retry] attempt $i: window=$WINDOW sentinel_ratio=$RATIO" >&2
  # Non-positive ratios mean the sentinels FAILED (window unknown) —
  # treat them as worst, never as best, and never keep that artifact.
  KEEP=$(python3 -c "print(1 if $RATIO > 0 and $RATIO < $BEST else 0)")
  if [ "$WINDOW" = "unknown" ]; then KEEP=0; fi
  if [ "$KEEP" = "1" ]; then
    BEST=$RATIO
    cp BENCH_FULL.json /tmp/bench_best.json
  fi
  if [ "$WINDOW" = "clean" ]; then
    echo "[bench_retry] clean window caught on attempt $i" >&2
    break
  fi
  [ "$i" -lt "$N" ] && sleep "$SLEEP"
done
# restore the best attempt as the kept artifact
if [ -f /tmp/bench_best.json ]; then
  cp /tmp/bench_best.json BENCH_FULL.json
  echo "[bench_retry] kept artifact: sentinel_ratio=$BEST" >&2
  cat BENCH_FULL.json
else
  echo "[bench_retry] no successful attempt" >&2
  exit 1
fi
