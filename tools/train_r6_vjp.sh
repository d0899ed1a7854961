#!/bin/bash
# train_r6_full.sh with the fused Pallas conv backward enabled
# (MSIG_CONV_VJP=2, ops/conv3x3_vjp.py). Used for the tomato_r6 run's
# tail after the 22:04 UTC tunnel outage ate the measurement window:
# CPU-validated bitwise-equivalent numerics, and if the kernel delivers
# its projected step-time win on silicon the run finishes early enough
# to re-open the window — while exercising directive r4#1's kernel in
# the production training run itself.
export MSIG_CONV_VJP=2
exec bash "$(dirname "$0")/train_r6_full.sh" "$@"
