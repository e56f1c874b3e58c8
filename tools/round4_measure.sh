#!/bin/bash
# Round-4 measurement sequence (run alone on the box):
#  1. shuffle-payload probe: hashed vs string grams (verdict #4 evidence)
#  2. 500k scaling sweep: local[2] / local[8] / local[16] / local[32], 3 reps
#  3. sf0.1 bench at local[16] (committed) and local[32] (secondary)
# All JSON lines appended to .bench_cache/round4_measurements.jsonl
set -u
cd /root/repo
OUT=.bench_cache/round4_measurements.jsonl
mkdir -p .bench_cache
python tools/scaling_run.py --gen-only --rows 200000
python tools/scaling_run.py --gen-only --rows 500000

echo "--- shuffle probe" >&2
for v in hashed string; do
  python tools/shuffle_probe.py --variant $v --rows 200000 --cpus 16 --verify-ngram 3 \
    2>/dev/null | tail -1 >> $OUT
done

echo "--- scaling sweep" >&2
for c in 2 8 16 32; do
  python tools/scaling_run.py --cpus $c --rows 500000 --reps 3 2>/dev/null | tail -1 >> $OUT
done

echo "--- bench" >&2
for c in 16 32; do
  python bench.py --cpus $c 2>/dev/null | tail -1 >> $OUT
done
echo done >&2
