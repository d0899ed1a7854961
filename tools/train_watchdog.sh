#!/bin/bash
# Watchdog for a long tunneled-TPU training run.
#
# The axon TPU tunnel has twice (2026-08-17, 2026-08-19) stalled mid-RPC,
# leaving the training process alive but frozen (no log writes, no crash).
# This loop restarts the launcher when the log goes quiet; the launcher
# (tools/train_r4_full.sh) auto-resumes from the newest checkpoint.
#
# Usage: nohup bash tools/train_watchdog.sh <logfile> <pidfile> [stall_s] &
# Kills only the exact PID tree recorded in <pidfile> (no pattern matching).
# LAUNCHER selects the relaunch script (default: the round-4 config).
set -u
LOG=${1:?logfile}
PIDFILE=${2:?pidfile}
STALL=${3:-900}          # normal epoch ~26s; checkpoint write ~175s; 15 min = stalled
EPOCHS=${EPOCHS:-800}
LAUNCHER=${LAUNCHER:-tools/train_r4_full.sh}
while true; do
  sleep 120
  [ -f "$LOG" ] || continue
  pid=$(cat "$PIDFILE" 2>/dev/null || true)
  # If the run exited on its own (success or crash), stop watching: a crash
  # needs eyes, not a blind restart loop.
  if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
    echo "$(date -u +%FT%TZ) watchdog: run process gone; exiting" >> "$LOG.watchdog"
    exit 0
  fi
  age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  if [ "$age" -ge "$STALL" ]; then
    echo "$(date -u +%FT%TZ) watchdog: log quiet ${age}s >= ${STALL}s; restarting" >> "$LOG.watchdog"
    # Kill children (the python process) by exact parent PID, then the launcher.
    pkill -TERM -P "$pid" 2>/dev/null
    sleep 10
    pkill -KILL -P "$pid" 2>/dev/null
    kill -KILL "$pid" 2>/dev/null
    sleep 5
    nohup bash "$LAUNCHER" "$EPOCHS" >> "$LOG" 2>&1 &
    echo $! > "$PIDFILE"
    echo "$(date -u +%FT%TZ) watchdog: relaunched pid $(cat "$PIDFILE")" >> "$LOG.watchdog"
  fi
done
