#!/bin/bash
# Evidence batch for the FULL reference-sample-budget run (tomato_r4:
# 800 epochs x 125 steps @ batch 8 = 800,000 samples / 100,000 optimizer
# steps — the reference default run's total sample budget,
# /root/reference/config.py:15-16 + dataset.py:90-92).
#
# Run AFTER tools/train_r4_full.sh exits — the TPU serves one process at
# a time. Set TRAIN_LOG to the run's log file (default /tmp/train_r4.log).
#
#   1. headline bench + PSNR gate (solo)
#   2. epoch-800 quality eval (3 metrics x 9 domains) -> docs/quality_r4/
#   3. per-checkpoint quality trajectory -> docs/quality_r4/trajectory/
#      NOTE: separate out dir from docs/quality/trajectory — the r3b
#      trajectory caches per-epoch results by epoch NUMBER, and r4's
#      epochs 50..400 would collide with r3b's and be silently skipped.
#   4. epoch-800 fp16 demo export -> results/tomato_r4/demo_checkpoint
#   5. per-epoch log extraction for the committed artifact set
set -u
cd "$(dirname "$0")/.."
export PATH=/opt/venv/bin:$PATH
OUT=results/logs/r4_full
mkdir -p "$OUT"
run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$OUT/summary.txt"
  timeout "${T:-3000}" "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  tail -4 "$OUT/$name.log" | tee -a "$OUT/summary.txt"
  echo "--- rc=$rc" | tee -a "$OUT/summary.txt"
}

LAST=$(ls -d results/tomato_r4/checkpoints/epoch_* | sort -V | tail -1)
echo "final checkpoint: $LAST" | tee -a "$OUT/summary.txt"

TRAIN_LOG=${TRAIN_LOG:-/tmp/train_r4.log}
grep -o "epoch [0-9]*/[0-9]*.*" "$TRAIN_LOG" > results/tomato_r4/per_epoch_log.txt
cp "$TRAIN_LOG" "$OUT/train_r4_raw.log" 2>/dev/null

run bench_256 python bench.py
run psnr python tools/check_psnr_tpu.py
# Host-link-dependent numbers (the committed 35 img/s e2e row was measured
# on a ~2 MB/s tunnel; this host may differ) + the b8 step on the current
# (post-pallas-default-fix) XLA AdaIN path.
run bench_e2e python bench.py --mode e2e
run bench_train_b8 python bench.py --mode train --train_batch 8 --iters 20

run quality_final python tools/eval_quality.py --checkpoint "$LAST" \
    --out docs/quality_r4 --n_images 100 --domains 0 --batch_size 32
T=14400 run trajectory python tools/eval_quality_trajectory.py \
    --ckpt_root results/tomato_r4/checkpoints --extra_root /nonexistent \
    --out docs/quality_r4/trajectory --n_images 50 --every 1
run demo_export python tools/export_demo_checkpoint.py --checkpoint "$LAST" \
    --out results/tomato_r4/demo_checkpoint
echo done | tee -a "$OUT/summary.txt"
