#!/bin/bash
# Round-4 run shepherd: waits for the tomato_r5 800-epoch run to finish,
# relaunches it (resume-from-checkpoint) if it crash-exits early, and runs
# the post-training evidence batch (tools/post_train_r5.sh) once done.
#
# DEADLINE_EPOCH (unix seconds): if the run is still going past this, stop
# it via its exact pidfile PIDs (never pattern-matching) so the chip is
# free for the evidence batch and the driver's end-of-round bench.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/train_r5.log}
PIDFILE=${PIDFILE:-/tmp/train_r5.pid}
WD_PIDFILE=${WD_PIDFILE:-/tmp/watchdog.pid}
DEADLINE=${DEADLINE:-0}
MARKER=/tmp/round4_posttrain_started

note() { echo "$(date -u +%FT%TZ) monitor: $*" >> /tmp/round4_monitor.log; }

stop_tree() {  # stop launcher + child python by exact PIDs
  for pf in "$WD_PIDFILE" "$PIDFILE"; do
    pid=$(cat "$pf" 2>/dev/null) || continue
    [ -n "${pid:-}" ] || continue
    pkill -TERM -P "$pid" 2>/dev/null
    kill -TERM "$pid" 2>/dev/null
  done
  sleep 15
  for pf in "$WD_PIDFILE" "$PIDFILE"; do
    pid=$(cat "$pf" 2>/dev/null) || continue
    [ -n "${pid:-}" ] || continue
    pkill -KILL -P "$pid" 2>/dev/null
    kill -KILL "$pid" 2>/dev/null
  done
}

last_epoch() {
  grep -oE "epoch [0-9]+/800" "$LOG" 2>/dev/null | tail -1 | grep -oE "[0-9]+" | head -1
}

note "started; deadline=$(date -u -d "@$DEADLINE" +%FT%TZ 2>/dev/null || echo none)"
while true; do
  sleep 120
  ep=$(last_epoch); ep=${ep:-0}
  if [ "$ep" -ge 800 ]; then
    note "run complete (epoch $ep); waiting for process exit"
    for _ in $(seq 1 20); do
      pid=$(cat "$PIDFILE" 2>/dev/null)
      kill -0 "${pid:-0}" 2>/dev/null || break
      sleep 30
    done
    stop_tree   # ensure watchdog is gone too
    break
  fi
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    note "deadline hit at epoch $ep; stopping run to free the chip"
    stop_tree
    break
  fi
  pid=$(cat "$PIDFILE" 2>/dev/null)
  wd=$(cat "$WD_PIDFILE" 2>/dev/null)
  if ! kill -0 "${pid:-0}" 2>/dev/null && ! kill -0 "${wd:-0}" 2>/dev/null; then
    note "run AND watchdog exited at epoch $ep (<800): relaunching with resume"
    nohup env EXP=tomato_r5 bash tools/train_r4_full.sh 800 >> "$LOG" 2>&1 &
    echo $! > "$PIDFILE"
    # EXP/EPOCHS must reach the WATCHDOG too: its own stall-restart path
    # invokes train_r4_full.sh, which would otherwise default to tomato_r4.
    nohup env EXP=tomato_r5 EPOCHS=800 \
        bash tools/train_watchdog.sh "$LOG" "$PIDFILE" >> /dev/null 2>&1 &
    echo $! > "$WD_PIDFILE"
    note "relaunched pid $(cat "$PIDFILE") watchdog $(cat "$WD_PIDFILE")"
  fi
done

if [ ! -f "$MARKER" ]; then
  touch "$MARKER"
  note "starting post-training evidence batch"
  TRAIN_LOG="$LOG" bash tools/post_train_r5.sh >> /tmp/round4_posttrain.log 2>&1
  note "evidence batch finished rc=$?"
fi
