#!/bin/bash
# Round-4 evidence batch for the FULL reference-sample-budget run
# (tomato_r5: 800 epochs x 125 steps @ batch 8 = 800,000 samples /
# 100,000 optimizer steps — the reference default run's total sample
# budget, /root/reference/config.py:15-16 + dataset.py:90-92).
#
# Run AFTER the training run exits — the TPU serves one process at a
# time. Set TRAIN_LOG to the run's log file (default /tmp/train_r5.log).
#
#   1. headline bench (stall-proof supervisor) + 512^2 bench
#   2. PSNR gate + per-stage Pallas/XLA attribution (VERDICT r3 #3)
#   3. in-chain ablation at 256^2 and 512^2 (VERDICT r3 #6 ceiling data)
#   4. e2e / train-step re-measures
#   5. epoch-800 quality eval + per-checkpoint trajectory -> docs/quality_r5
#   6. epoch-800 fp16 demo export + per-epoch log artifact
#   7. solo quick-tier timing (CPU; VERDICT r3 #7 evidence)
set -u
cd "$(dirname "$0")/.."
export PATH=/opt/venv/bin:$PATH
OUT=results/logs/r5_full
mkdir -p "$OUT"
run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$OUT/summary.txt"
  timeout "${T:-3000}" "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  tail -4 "$OUT/$name.log" | tee -a "$OUT/summary.txt"
  echo "--- rc=$rc" | tee -a "$OUT/summary.txt"
}

LAST=$(ls -d results/tomato_r5/checkpoints/epoch_* | sort -V | tail -1)
echo "final checkpoint: $LAST" | tee -a "$OUT/summary.txt"

TRAIN_LOG=${TRAIN_LOG:-/tmp/train_r5.log}
grep -o "epoch [0-9]*/[0-9]*.*" "$TRAIN_LOG" > results/tomato_r5/per_epoch_log.txt
cp "$TRAIN_LOG" "$OUT/train_r5_raw.log" 2>/dev/null

# MSIG_TRUNK_HIFI set EXPLICITLY both ways: commit 1006774 flipped the
# default to off after this script was first written, so the bare runs
# and their _nohifi twins had become identical (advisor finding r4).
run bench_256 env MSIG_TRUNK_HIFI=1 python bench.py
run bench_256_nohifi env MSIG_TRUNK_HIFI=0 python bench.py
run bench_512 python bench.py --image_size 512
run psnr_attrib env MSIG_TRUNK_HIFI=1 python tools/check_psnr_tpu.py
run psnr_attrib_nohifi env MSIG_TRUNK_HIFI=0 python tools/check_psnr_tpu.py
run ablate_256 env B=256 MSIG_TRUNK_HIFI=1 python tools/ablate_chain_r3.py
run ablate_256_nohifi env B=256 MSIG_TRUNK_HIFI=0 python tools/ablate_chain_r3.py
run ablate_512 env SIZE=512 B=32 python tools/ablate_chain_r3.py
run bench_e2e python bench.py --mode e2e
run bench_train_b8 python bench.py --mode train --train_batch 8 --iters 20
run bench_train_b32 python bench.py --mode train --train_batch 32 --iters 10

run quality_final python tools/eval_quality.py --checkpoint "$LAST" \
    --out docs/quality_r5 --n_images 100 --domains 0 --batch_size 32
run demo_export python tools/export_demo_checkpoint.py --checkpoint "$LAST" \
    --out results/tomato_r5/demo_checkpoint

# CPU-only: solo timing of the quick tier on this host.
T=1200 run quick_tier python -m pytest tests/ -q -m "not slow and not heavy"

# Longest item LAST: per-checkpoint trajectory over all 16 checkpoints —
# partial results are still useful if the round's clock runs out first.
T=14400 run trajectory python tools/eval_quality_trajectory.py \
    --ckpt_root results/tomato_r5/checkpoints --extra_root /nonexistent \
    --out docs/quality_r5/trajectory --n_images 50 --every 1
echo done | tee -a "$OUT/summary.txt"
