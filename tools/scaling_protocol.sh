#!/bin/bash
# BASELINE.md measurement protocol: cold session per rep, 3 reps per
# parallelism, results appended as JSON lines.
set -u
OUT=.bench_cache/scaling_results.jsonl
: > "$OUT"
for rep in 1 2 3; do
  for cpus in 32 8; do
    echo "--- cpus=$cpus rep=$rep $(date +%H:%M:%S)" >&2
    python tools/scaling_run.py --cpus $cpus --rows 200000 2>/dev/null | tail -1 >> "$OUT"
  done
done
echo DONE >&2
