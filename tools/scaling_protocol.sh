#!/bin/bash
# BASELINE.md measurement protocol: one cold session per parallelism,
# 1 untimed warmup + 3 timed reps inside it, cold-session warmup time
# also reported. Results appended as JSON lines.
set -u
OUT=.bench_cache/scaling_results.jsonl
: > "$OUT"
ROWS="${SCALING_ROWS:-500000}"
for cpus in 32 8; do
  echo "--- cpus=$cpus rows=$ROWS $(date +%H:%M:%S)" >&2
  python tools/scaling_run.py --cpus $cpus --rows "$ROWS" --reps 3 2>/dev/null | tail -1 >> "$OUT"
done
echo DONE >&2
