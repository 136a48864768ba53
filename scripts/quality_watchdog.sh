#!/bin/bash
# Keep the quality training run alive across axon-tunnel stalls: launch
# the (auto-resuming) trainer, kill the EXACT child PID if the log goes
# quiet for >6 min, relaunch from checkpoint_latest. Exits when training
# reports completion or after too many restarts.
LOG=/root/repo/quality/train.log
DONE_MARK=/root/repo/quality/TRAIN_DONE
rm -f "$DONE_MARK"
restarts=0
while [ $restarts -lt 40 ]; do
  python /root/repo/scripts/run_quality_train.py >> "$LOG" 2>&1 &
  PID=$!
  echo "watchdog: trainer pid $PID (restart $restarts)" >> "$LOG"
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mtime=$(stat -c %Y "$LOG")
    if [ $((now - mtime)) -gt 360 ]; then
      echo "watchdog: log stale $((now - mtime))s, killing $PID" >> "$LOG"
      kill -9 $PID 2>/dev/null
      sleep 5
      break
    fi
  done
  wait $PID 2>/dev/null
  rc=$?
  # finished cleanly at the step limit?
  if [ $rc -eq 0 ] && grep -q "step 50000 " "$LOG"; then
    touch "$DONE_MARK"; echo "watchdog: training complete" >> "$LOG"; exit 0
  fi
  if [ $rc -eq 0 ]; then
    # trainer exited 0 (max steps reached or interrupted save) — check step
    last=$(grep -o 'step [0-9]*' "$LOG" | tail -1 | cut -d' ' -f2)
    if [ "${last:-0}" -ge 49999 ]; then
      touch "$DONE_MARK"; echo "watchdog: training complete" >> "$LOG"; exit 0
    fi
  fi
  restarts=$((restarts + 1))
done
echo "watchdog: gave up after $restarts restarts" >> "$LOG"
