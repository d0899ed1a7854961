#!/bin/bash
# Final round-3 measurement + quality batch. Run AFTER the tomato_r3
# training process exits (the TPU serves one process at a time — see
# .claude/skills/verify). Logs to results/logs/r3_final/.
#
# Order (value-first, so a mid-batch interruption still leaves the
# important artifacts):
#   1. headline bench (confirm >=2,000 img/s on the current tree)
#   2. PSNR gate (>=35 dB)
#   3. enc1 dense-K im2col site bench (PERF.md "pending measurement";
#      if it wins, flip the default and re-run 1+2)
#   4. final-checkpoint quality eval (all 9 domains, 100 images)
#   5. per-checkpoint quality trajectory (every 2nd checkpoint)
#   6. 512^2 bench re-confirm
set -u
OUT=results/logs/r3_final
mkdir -p "$OUT"
run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$OUT/summary.txt"
  timeout "${T:-3000}" "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  tail -4 "$OUT/$name.log" | tee -a "$OUT/summary.txt"
  echo "--- rc=$rc" | tee -a "$OUT/summary.txt"
}

LAST=$(ls -d results/tomato_r3b/checkpoints/epoch_* | sort -V | tail -1)
echo "final checkpoint: $LAST" | tee -a "$OUT/summary.txt"

run bench_256 python bench.py
run psnr python tools/check_psnr_tpu.py
run enc1_im2col python tools/bench_enc1_im2col.py 128 30
run quality_final python tools/eval_quality.py --checkpoint "$LAST" \
    --out docs/quality --n_images 100 --domains 0 --batch_size 32
T=7200 run trajectory python tools/eval_quality_trajectory.py \
    --ckpt_root results/tomato_r3b/checkpoints --extra_root /nonexistent \
    --out docs/quality/trajectory --n_images 50 --every 2
run bench_512 python bench.py --image_size 512 --iters 10
run train_512 python bench.py --mode train --image_size 512 --train_batch 8 --iters 5
echo done | tee -a "$OUT/summary.txt"
