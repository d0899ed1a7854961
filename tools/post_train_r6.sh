#!/bin/bash
# Round-5 evidence batch. Run AFTER the tomato_r6 training run exits —
# the TPU serves one process at a time. Ordered by directive priority so
# an end-of-round cutoff loses the least:
#
#   1. 16-checkpoint quality trajectory (VERDICT r4 #4 — the artifact the
#      6-h training re-run exists to produce). Single-process evaluator.
#   2. conv-backward kernel rows (#1): micro + step variants.
#   3. hifi2 error-plane carry (#2): bench + PSNR.
#   4. fp16-staged 512^2 (#3): bench + PSNR gate.
#   5. trunk epilogue decomposition (#5).
#   6. latency curve (#7).
#   7. headline bench last (the driver re-measures it at round end anyway;
#      running it here warms the compile cache for that run).
#
# Rows with unchanged round-4 numbers (stock b32/b8, stock 512, hifi=1)
# are NOT re-measured — docs cite results/logs/r5_full/.
set -u
cd "$(dirname "$0")/.."
export PATH=/opt/venv/bin:$PATH
OUT=results/logs/r6_full
mkdir -p "$OUT"
run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$OUT/summary.txt"
  timeout "${T:-2400}" "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  tail -4 "$OUT/$name.log" | tee -a "$OUT/summary.txt"
  echo "--- rc=$rc" | tee -a "$OUT/summary.txt"
}

TRAIN_LOG=${TRAIN_LOG:-/tmp/train_r6.log}
grep -o "epoch [0-9]*/[0-9]*.*" "$TRAIN_LOG" > results/tomato_r6/per_epoch_log.txt 2>/dev/null
cp "$TRAIN_LOG" "$OUT/train_r6_raw.log" 2>/dev/null

# 1. Directive #4: the full trajectory from the fp16 EMA snapshots
#    (in-memory evaluator: ~20 s/checkpoint on the chip).
T=3600 run trajectory python tools/eval_trajectory_fast.py \
    --snap_root results/tomato_r6/ema_snapshots \
    --out docs/quality_r6/trajectory --n_images 50

# portable demo artifact = the NEWEST snapshot, verbatim
LAST_SNAP=$(ls -d results/tomato_r6/ema_snapshots/epoch_* 2>/dev/null | sort -V | tail -1)
if [ -n "$LAST_SNAP" ]; then
  mkdir -p results/tomato_r6/demo_checkpoint
  cp "$LAST_SNAP"/* results/tomato_r6/demo_checkpoint/ 2>/dev/null
  echo "demo_checkpoint <- $LAST_SNAP" | tee -a "$OUT/summary.txt"
fi

# 2. Directive #1: fused conv backward (the "Done =" rows).
run conv_vjp_micro python tools/bench_conv_vjp.py --mode micro --batch 32
run bench_train_b32_vjp2 env MSIG_CONV_VJP=2 python bench.py --mode train --train_batch 32 --iters 10
run bench_train_b8_vjp2 env MSIG_CONV_VJP=2 python bench.py --mode train --train_batch 8 --iters 20

# 3. Directive #2: error-plane residual carry.
run bench_256_hifi2 env MSIG_TRUNK_HIFI=2 python bench.py
run psnr_hifi2 env MSIG_TRUNK_HIFI=2 ATTRIBUTE=0 python tools/check_psnr_tpu.py

# 4. Directive #3: fp16-staged accumulators at 512^2.
run bench_512_fp16stage env MSIG_STAGE_FP16=1 python bench.py --image_size 512
run psnr_512_fp16stage env SIZE=512 B=4 MSIG_STAGE_FP16=1 ATTRIBUTE=0 python tools/check_psnr_tpu.py

# 5. Directive #5: trunk epilogue decomposition.
run trunk_epilogue python tools/bench_trunk_epilogue.py --batch 256

# 6. Directive #7: latency curve.
run bench_latency python bench.py --mode latency

# 7. Secondary train-step rows (level attribution + the gram lever).
run bench_train_b32_vjp1 env MSIG_CONV_VJP=1 python bench.py --mode train --train_batch 32 --iters 10
run bench_train_b32_vjp2_gram env MSIG_CONV_VJP=2 GRAM_BF16=1 python bench.py --mode train --train_batch 32 --iters 10

# 8. Headline last (also warms the driver's bench compile cache).
run bench_256 python bench.py
run bench_512 python bench.py --image_size 512
echo done | tee -a "$OUT/summary.txt"
