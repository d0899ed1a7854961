#!/bin/bash
# End-of-round cutover: stop the tomato_r6 run cleanly (exact PIDs, after
# whatever snapshot boundary it has reached) and run the evidence batch.
# Used instead of the completion-triggered autolaunch because two tunnel
# outages + two fused-backward production experiments cost the run ~1.9 h;
# the round ends before epoch 800 can be reached (docs/ROUND5.md).
set -u
cd "$(dirname "$0")/.."
WD_PID=$(cat /tmp/watchdog_r6.pid 2>/dev/null || true)
[ -n "$WD_PID" ] && kill "$WD_PID" 2>/dev/null
AL_PID=$(cat /tmp/autolaunch.pid 2>/dev/null || true)
[ -n "$AL_PID" ] && kill "$AL_PID" 2>/dev/null
pid=$(cat /tmp/train_r6.pid 2>/dev/null || true)
if [ -n "$pid" ]; then
  pkill -TERM -P "$pid" 2>/dev/null
  sleep 8
  pkill -KILL -P "$pid" 2>/dev/null
  kill -KILL "$pid" 2>/dev/null
fi
sleep 3
echo "$(date -u +%FT%TZ) endgame: training stopped; starting evidence batch"
TRAIN_LOG=/tmp/train_r6.log bash tools/post_train_r6.sh
echo "$(date -u +%FT%TZ) endgame: batch done"
