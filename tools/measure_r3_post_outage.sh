#!/bin/bash
# Round-3 measurement batch to run as soon as the axon tunnel recovers.
# Each step logs to results/logs/r3_post_outage/. Ordered by value:
#   1. headline bench (micro-trims pending re-measure; target >=2000)
#   2. PSNR gate (must hold >=35 dB)
#   3. b32 train-step variants (remat=cycle, vgg_pair=2x2 — VERDICT #2)
#   4. enc1 im2col site bench (flip MSIG_ENC1_IM2COL if it wins, re-bench)
#   5. fresh 512^2 inference + train numbers (VERDICT #3)
# After these: resume training from epoch_150 toward >=50k steps
# (tools/resume_tomato_training.sh) and the per-epoch quality trajectory.
set -u
OUT=results/logs/r3_post_outage
mkdir -p "$OUT"
run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$OUT/summary.txt"
  timeout 3000 "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  tail -4 "$OUT/$name.log" | tee -a "$OUT/summary.txt"
  echo "--- rc=$rc" | tee -a "$OUT/summary.txt"
}

run bench_256 python bench.py
run psnr python tools/check_psnr_tpu.py
run train_variants python tools/bench_train_variants.py
run enc1_im2col python tools/bench_enc1_im2col.py 128 30
run bench_512 python bench.py --image_size 512 --iters 10
run train_512 python bench.py --mode train --image_size 512 --train_batch 8 --iters 5
echo done
