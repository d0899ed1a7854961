#!/bin/bash
# Round-3 (continued session) measurement batch. Run AFTER the 400-epoch
# seeded re-run (tools/resume_tomato_training.sh, log results/logs/r4_train.log)
# exits — the TPU serves one process at a time.
#
# Context: the original r3_final measurement logs and ALL training
# checkpoints were lost in a machine rotation before being committed
# (only results/logs/r3_post_outage/ survived, and its enc1 log is a
# failed run predating the tool fix). This batch re-creates the evidence
# on the current tree from the re-run's checkpoints:
#   1. headline bench + PSNR gate (solo, no host contention)
#   2. enc1 dense-K im2col site bench (the PERF.md 5.60/11.83 claim)
#   3. per-epoch log extraction + reproducibility diff vs the committed
#      results/tomato_r3b/per_epoch_log.txt (same seed => same curve)
#   4. epoch-400 quality eval (compare with committed docs/quality/quality.json)
#   5. per-checkpoint quality trajectory -> docs/quality/trajectory/
#      (the committed artifact QUALITY.md promises)
#   6. fresh epoch-400 fp16 demo export
set -u
cd "$(dirname "$0")/.."
export PATH=/opt/venv/bin:$PATH
OUT=results/logs/r4_verify
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

# Per-epoch log extraction + seeded-reproducibility check
grep -o "epoch [0-9]*/[0-9]*.*" results/logs/r4_train.log > "$OUT/per_epoch_log_r4.txt"
diff <(sed 's/ *[0-9.]*s ([0-9.]* ms\/step) *//' "$OUT/per_epoch_log_r4.txt") \
     <(sed 's/ *[0-9.]*s ([0-9.]* ms\/step) *//' results/tomato_r3b/per_epoch_log.txt) \
     > "$OUT/per_epoch_repro.diff"; echo "repro diff lines: $(wc -l < "$OUT/per_epoch_repro.diff")" | tee -a "$OUT/summary.txt"

run quality_final python tools/eval_quality.py --checkpoint "$LAST" \
    --out docs/quality --n_images 100 --domains 0 --batch_size 32
T=7200 run trajectory python tools/eval_quality_trajectory.py \
    --ckpt_root results/tomato_r3b/checkpoints --extra_root /nonexistent \
    --out docs/quality/trajectory --n_images 50 --every 2
run demo_export python tools/export_demo_checkpoint.py --checkpoint "$LAST" \
    --out results/tomato_r3b/demo_checkpoint
echo done | tee -a "$OUT/summary.txt"
