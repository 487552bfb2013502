#!/bin/bash
# Deliberate CPU-hog harness for bench-probe calibration (r12 single-thread
# probe calibration; r14 multi-core probe calibration). Spawns N busy-loop
# processes and kills them when this script receives SIGTERM/SIGINT or when
# the optional timeout elapses.
#
#   dev/hogs.sh <n_hogs> [seconds]
#
# n_hogs=32 reproduces the r12 "hard steal" mode (~2x single-thread probe),
# n_hogs=4..8 on a 32-core box reproduces the MILD UNIFORM steal mode
# (~11-14% inflation) that the single-thread probe is structurally blind to
# (three r13 passes carried it while reading probe-clean).
set -u
n=${1:?usage: dev/hogs.sh <n_hogs> [seconds]}
secs=${2:-0}
pids=()
cleanup() { kill "${pids[@]}" 2>/dev/null; wait 2>/dev/null; exit 0; }
trap cleanup TERM INT
for _ in $(seq "$n"); do
  (while :; do :; done) &
  pids+=($!)
done
echo "hogs: $n busy loops running (pids ${pids[*]})"
if [ "$secs" -gt 0 ]; then sleep "$secs"; cleanup; else wait; fi
