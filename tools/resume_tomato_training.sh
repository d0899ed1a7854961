#!/bin/bash
# Extend the round-2 real-data run (VERDICT r2 next-round #4): resume from
# results/tomato_r2/checkpoints/epoch_150 (18,750 optimizer steps at batch
# 8) and push toward >=50k steps. 400 total epochs x 125 steps = 50,000.
# ~390 ms/step --device_data => ~3.4 h for the remaining 250 epochs; run in
# the background and checkpoint every 25 epochs so partial progress counts.
set -eu
EPOCHS=${1:-400}
python main.py \
  --source_dir /root/reference/data/src/Tomato_healthy \
  --target_dir /root/reference/data/ref \
  --save_dir_base results --exp_name tomato_r3 \
  --resume results/tomato_r2/checkpoints/epoch_150 \
  --allow_random_vgg --compute_dtype bfloat16 --image_size 256 \
  --batch_size 8 --epochs "$EPOCHS" --save_freq 25 --device_data \
  --no_data_parallel --seed 0
