#!/bin/bash
# Fire the round-5 evidence batch the moment the tomato_r6 training run
# COMPLETES (not merely dies — the watchdog restarts stalls). Polls the
# training log for the completion banner, waits for the pid to exit, then
# runs tools/post_train_r6.sh. Zero turn-latency between the chip freeing
# up and the measurement batch starting.
#
# Usage: nohup bash tools/r6_autolaunch.sh <train_log> <train_pidfile> &
set -u
LOG=${1:?train log}
PIDFILE=${2:?train pidfile}
cd "$(dirname "$0")/.."
while true; do
  sleep 60
  if grep -q "Multi-Domain Experiment .* Completed" "$LOG" 2>/dev/null; then
    pid=$(cat "$PIDFILE" 2>/dev/null || true)
    if [ -n "$pid" ]; then
      while kill -0 "$pid" 2>/dev/null; do sleep 10; done
    fi
    echo "$(date -u +%FT%TZ) autolaunch: training complete; starting evidence batch" \
      >> /tmp/r6_autolaunch.log
    TRAIN_LOG="$LOG" bash tools/post_train_r6.sh >> /tmp/r6_autolaunch.log 2>&1
    echo "$(date -u +%FT%TZ) autolaunch: evidence batch finished" >> /tmp/r6_autolaunch.log
    exit 0
  fi
done
