#!/bin/bash
# v2: adopt an already-running trainer; after any (re)launch allow a 900 s
# compile grace before stall detection (first axon compile can take ~7 min).
# Env: QR_LOG (log file), QR_STEPS (done threshold), QR_EXP/QR_HP passed
# through to run_quality_train.py.
LOG=${QR_LOG:-/root/repo/quality/train.log}
STEPS=${QR_STEPS:-40000}
DONE_AT=$((STEPS - 1))
DONE_MARK=/root/repo/quality/TRAIN_DONE
rm -f "$DONE_MARK"
restarts=0
PID=$(pgrep -f run_quality_train.py | head -1)
launched=$(date +%s)
if [ -z "$PID" ]; then
  python /root/repo/scripts/run_quality_train.py >> "$LOG" 2>&1 &
  PID=$!
  launched=$(date +%s)
  echo "watchdog2: launched trainer pid $PID" >> "$LOG"
else
  echo "watchdog2: adopted trainer pid $PID" >> "$LOG"
fi
while [ $restarts -lt 40 ]; do
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mtime=$(stat -c %Y "$LOG")
    age=$((now - mtime))
    since_launch=$((now - launched))
    if [ $age -gt 360 ] && [ $since_launch -gt 900 ]; then
      echo "watchdog2: log stale ${age}s, killing $PID" >> "$LOG"
      kill -9 $PID 2>/dev/null
      sleep 5
      break
    fi
  done
  # done?
  last=$(grep -o 'step [0-9]*' "$LOG" | tail -1 | cut -d' ' -f2)
  if [ "${last:-0}" -ge "$DONE_AT" ]; then
    touch "$DONE_MARK"; echo "watchdog2: training complete at step $last" >> "$LOG"; exit 0
  fi
  if ! kill -0 $PID 2>/dev/null && ! pgrep -f run_quality_train.py >/dev/null; then
    restarts=$((restarts + 1))
    python /root/repo/scripts/run_quality_train.py >> "$LOG" 2>&1 &
    PID=$!
    launched=$(date +%s)
    echo "watchdog2: relaunched trainer pid $PID (restart $restarts)" >> "$LOG"
  else
    PID=$(pgrep -f run_quality_train.py | head -1)
  fi
done
echo "watchdog2: gave up after $restarts restarts" >> "$LOG"
