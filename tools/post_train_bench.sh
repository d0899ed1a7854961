#!/bin/bash
# Post-training measurement sequence (run AFTER the training process exits;
# the TPU serves one process at a time). Writes everything under /tmp/ptb.
set -x
mkdir -p /tmp/ptb
cd /root/repo

# 1. Headline inference bench (fused encoder + ps decoder now default)
timeout 2400 python bench.py > /tmp/ptb/bench_inference.json 2> /tmp/ptb/bench_inference.log

# 2. Train-step bench (batched forwards)
timeout 2400 python bench.py --mode train > /tmp/ptb/bench_train.json 2> /tmp/ptb/bench_train.log

# 3. End-to-end serving bench (decode from disk)
timeout 2400 python bench.py --mode e2e > /tmp/ptb/bench_e2e.json 2> /tmp/ptb/bench_e2e.log

echo DONE

# 4. Fused-path PSNR gate on TPU
timeout 2400 python tools/check_psnr_tpu.py > /tmp/ptb/psnr.log 2>&1

# 5. Full quality eval on the final checkpoint (all 9 domains, 100 imgs)
CKPT=results/tomato_r2/checkpoints/epoch_150
timeout 5400 python tools/eval_quality.py --checkpoint "$CKPT" \
  --out docs/quality --n_images 100 --domains 0 --batch_size 32 \
  > /tmp/ptb/quality.log 2>&1

echo ALLDONE
