#!/bin/bash
# Round-3 measurement batch to run as soon as the axon tunnel recovers.
# Each step logs to results/logs/r3_post_outage/. Ordered by value:
# headline first (micro-trims pending re-measure), then the PSNR gate,
# train-step variants (remat=cycle), and the fresh 512^2 numbers
# (VERDICT r2 weak #3).
set -u
OUT=results/logs/r3_post_outage
mkdir -p "$OUT"
run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$OUT/summary.txt"
  timeout 3000 "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.txt"
  echo "--- rc=$rc" | tee -a "$OUT/summary.txt"
}

run bench_256 python bench.py
run psnr python tools/check_psnr_tpu.py
run train_variants python tools/bench_train_variants.py
run bench_512 python bench.py --image_size 512 --iters 10
run train_512 python bench.py --mode train --image_size 512 --train_batch 8 --iters 5
echo done
