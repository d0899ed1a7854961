#!/bin/bash
# Round-5 evidence batch. Run AFTER the tomato_r6 training run exits —
# the TPU serves one process at a time.
#
#   1. 16-checkpoint quality trajectory from the fp16 EMA snapshots
#      (VERDICT r4 #4) — runs FIRST: it is the directive this round's
#      training run exists to close.
#   2. headline bench + 512^2 bench + latency mode (VERDICT r4 #7)
#   3. PSNR gate both quality modes (hifi env explicit both ways —
#      advisor finding r4)
#   4. train-step re-measures (VERDICT r4 #1 evidence)
#   5. epoch-800 quality eval + fp16 demo export
set -u
cd "$(dirname "$0")/.."
export PATH=/opt/venv/bin:$PATH
OUT=results/logs/r6_full
mkdir -p "$OUT"
run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$OUT/summary.txt"
  timeout "${T:-3000}" "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  tail -4 "$OUT/$name.log" | tee -a "$OUT/summary.txt"
  echo "--- rc=$rc" | tee -a "$OUT/summary.txt"
}

TRAIN_LOG=${TRAIN_LOG:-/tmp/train_r6.log}
grep -o "epoch [0-9]*/[0-9]*.*" "$TRAIN_LOG" > results/tomato_r6/per_epoch_log.txt 2>/dev/null
cp "$TRAIN_LOG" "$OUT/train_r6_raw.log" 2>/dev/null

# Directive #4 first: the full trajectory from the cheap EMA snapshots.
T=10800 run trajectory python tools/eval_quality_trajectory.py \
    --ckpt_root results/tomato_r6/ema_snapshots --extra_root /nonexistent \
    --out docs/quality_r6/trajectory --n_images 50 --every 1

LAST=$(ls -d results/tomato_r6/checkpoints/epoch_* 2>/dev/null | sort -V | tail -1)
echo "final checkpoint: $LAST" | tee -a "$OUT/summary.txt"
run quality_final python tools/eval_quality.py --checkpoint "$LAST" \
    --out docs/quality_r6 --n_images 100 --domains 0 --batch_size 32
run demo_export python tools/export_demo_checkpoint.py --checkpoint "$LAST" \
    --out results/tomato_r6/demo_checkpoint

run bench_256 python bench.py
run bench_256_hifi env MSIG_TRUNK_HIFI=1 python bench.py
run bench_256_hifi2 env MSIG_TRUNK_HIFI=2 python bench.py
run bench_512 python bench.py --image_size 512
run bench_512_fp16stage env MSIG_STAGE_FP16=1 python bench.py --image_size 512
run bench_latency python bench.py --mode latency
run psnr_hifi2 env MSIG_TRUNK_HIFI=2 python tools/check_psnr_tpu.py
run psnr_hifi env MSIG_TRUNK_HIFI=1 python tools/check_psnr_tpu.py
run psnr_stock env MSIG_TRUNK_HIFI=0 python tools/check_psnr_tpu.py
run psnr_512_fp16stage env SIZE=512 B=4 MSIG_STAGE_FP16=1 ATTRIBUTE=0 python tools/check_psnr_tpu.py
run psnr_512_stock env SIZE=512 B=4 ATTRIBUTE=0 python tools/check_psnr_tpu.py
run trunk_epilogue python tools/bench_trunk_epilogue.py --batch 256
run conv_vjp_micro python tools/bench_conv_vjp.py --mode micro --batch 32
run bench_train_b8 python bench.py --mode train --train_batch 8 --iters 20
run bench_train_b8_vjp env MSIG_CONV_VJP=1 python bench.py --mode train --train_batch 8 --iters 20
run bench_train_b8_vjp2 env MSIG_CONV_VJP=2 python bench.py --mode train --train_batch 8 --iters 20
run bench_train_b32 python bench.py --mode train --train_batch 32 --iters 10
run bench_train_b32_vjp env MSIG_CONV_VJP=1 python bench.py --mode train --train_batch 32 --iters 10
run bench_train_b32_vjp2 env MSIG_CONV_VJP=2 python bench.py --mode train --train_batch 32 --iters 10
run bench_train_b32_vjp2_gram env MSIG_CONV_VJP=2 GRAM_BF16=1 python bench.py --mode train --train_batch 32 --iters 10
echo done | tee -a "$OUT/summary.txt"
