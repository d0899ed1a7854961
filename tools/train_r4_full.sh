#!/bin/bash
# Round-3 continuation: a full reference-sample-budget training run.
#
# The reference's defaults are 200 epochs x 1,000 steps @ batch 4
# (/root/reference/config.py:15-16, dataset.py:90-92) = 800,000 samples
# seen / 200,000 optimizer steps. On the bundled data our epoch semantics
# give 125 steps/epoch at batch 8, so 800 epochs x 125 x 8 = 800,000
# samples (100,000 optimizer steps) — sample-budget parity with the
# reference's default run, and 2x the steps AND samples of the committed
# tomato_r3b run (400 epochs / 50k steps).
#
# Checkpoint cadence is 50 epochs (not the parity default 10): on this
# tunneled runtime each full-state checkpoint write fetches ~350 MB
# device->host at ~2 MB/s (~175 s); 16 writes keep the overhead under an
# hour while still giving a resumable trail and a trajectory curve.
#
# Resumes from the newest results/$EXP/checkpoints/epoch_N if present.
set -eu
EPOCHS=${1:-800}
EXP=${EXP:-tomato_r4}
RESUME_ARGS=()
LAST=$(ls -d results/$EXP/checkpoints/epoch_* 2>/dev/null | sort -V | tail -1 || true)
if [ -n "${LAST:-}" ]; then
  echo "resuming from $LAST"
  RESUME_ARGS=(--resume "$LAST")
fi
python main.py \
  --source_dir /root/reference/data/src/Tomato_healthy \
  --target_dir /root/reference/data/ref \
  --save_dir_base results --exp_name "$EXP" \
  "${RESUME_ARGS[@]+"${RESUME_ARGS[@]}"}" \
  --allow_random_vgg --compute_dtype bfloat16 --image_size 256 \
  --batch_size 8 --epochs "$EPOCHS" --save_freq 125 --device_data \
  --checkpoint_every 50 \
  --no_data_parallel --seed 0
