#!/bin/bash
# Final tomato_r6 tail: stock numerics, per-epoch artifacts skipped
# (MSIG_SKIP_EPOCH_ART=1) — the sample-grid device fetch + matplotlib
# plots cost ~5 s/epoch on the post-outage degraded tunnel.
export MSIG_SKIP_EPOCH_ART=1
exec bash "$(dirname "$0")/train_r6_full.sh" "$@"
