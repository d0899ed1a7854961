#!/bin/bash
# Round-3 long training run (VERDICT r2 next-round #4): >=50k optimizer
# steps on the bundled tomato data. 400 epochs x 125 steps @ batch 8 =
# 50,000 steps; ~390 ms/step with --device_data => ~5.5 h. Checkpoints
# every 25 epochs so the quality trajectory (tools/eval_quality_trajectory.py)
# has a dense curve and partial progress counts.
#
# Resumes from results/tomato_r3/checkpoints/epoch_N if present (the
# round-2 orbax checkpoints did not survive the machine rotation — only
# the committed fp16 EMA demo did, which is not a full train state), else
# starts fresh. A fresh 0->400 run also gives a cleaner single-run
# trajectory plot than a spliced resume.
set -eu
EPOCHS=${1:-400}
EXP=${EXP:-tomato_r3b}
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
  --no_data_parallel --seed 0
