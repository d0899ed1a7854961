#!/bin/bash
# train_r6_full.sh with MSIG_CONV_VJP=1 (fused conv backward only; XLA
# keeps the AdaIN/IN backward). Level 2 measured 219 ms/step at b8 vs
# stock 205 — the in-kernel IN reductions serialize with the matmuls
# (same Mosaic no-overlap behavior as the v3 trunk experiment).
export MSIG_CONV_VJP=1
exec bash "$(dirname "$0")/train_r6_full.sh" "$@"
