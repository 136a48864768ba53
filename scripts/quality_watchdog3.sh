#!/bin/bash
# Quality-run watchdog v3 — addresses every round-3 failure mode:
#   * before killing a stalled trainer, ask it for a Python stack dump
#     (SIGUSR1 -> faulthandler, registered by run_quality_train.py) so the
#     log records WHY it hung, not just that it did;
#   * before (re)launching, probe the TPU with a short jax-init subprocess —
#     never fight another process (e.g. the bench driver) for the chip;
#   * exponential backoff between relaunches;
#   * give up after 3 consecutive relaunches with zero step progress
#     (identical-failure loop) instead of 40 blind restarts;
#   * trainer exit code 3 == collapse_abort -> stop immediately (the run is
#     diagnosed dead, relaunching cannot help).
# Env: QR_LOG, QR_STEPS, QR_ROOT/QR_EXP/QR_PRESET/QR_HP passed through.
set -u
LOG=${QR_LOG:-/root/repo/quality/train.log}
STEPS=${QR_STEPS:-40000}
DONE_AT=$((STEPS - 1))
ROOT=$(dirname "$LOG")
DONE_MARK=$ROOT/TRAIN_DONE
FAIL_MARK=$ROOT/TRAIN_FAILED
rm -f "$DONE_MARK" "$FAIL_MARK"

STALE_S=360          # log considered stale after this many quiet seconds
GRACE_S=900          # compile grace after a (re)launch
PROBE_TIMEOUT=90

log() { echo "watchdog3[$(date +%H:%M:%S)]: $*" >> "$LOG"; }

probe_tpu() {
  # cheap liveness check in a subprocess; returns 0 iff the chip answers
  timeout $PROBE_TIMEOUT python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); (x @ x).block_until_ready()
assert jax.devices()
EOF
}

last_step() { grep -o '^step [0-9]*' "$LOG" 2>/dev/null | tail -1 | cut -d' ' -f2; }

launch() {
  python /root/repo/scripts/run_quality_train.py >> "$LOG" 2>&1 &
  PID=$!
  launched=$(date +%s)
  log "launched trainer pid $PID"
}

PID=""
restarts=0
no_progress=0
backoff=30
step_before=$(last_step); step_before=${step_before:-0}

if probe_tpu; then
  launch
else
  log "TPU probe failed before first launch; waiting 120s"
  sleep 120
  probe_tpu || { log "TPU probe failed twice; giving up"; touch "$FAIL_MARK"; exit 1; }
  launch
fi

while true; do
  # ---- watch the running trainer ----
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    now=$(date +%s); mtime=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    age=$((now - mtime)); since_launch=$((now - launched))
    if [ $age -gt $STALE_S ] && [ $since_launch -gt $GRACE_S ]; then
      log "log stale ${age}s -> requesting stack dump (SIGUSR1) from $PID"
      kill -USR1 "$PID" 2>/dev/null
      sleep 15   # give faulthandler time to write the traceback into the log
      log "killing stalled trainer $PID"
      kill -9 "$PID" 2>/dev/null
      sleep 5
      break
    fi
  done
  wait "$PID" 2>/dev/null; rc=$?

  # ---- done? ----
  ls=$(last_step); ls=${ls:-0}
  if [ "$ls" -ge "$DONE_AT" ] || [ -f "$DONE_MARK" ]; then
    touch "$DONE_MARK"; log "training complete at step $ls"; exit 0
  fi
  if [ "$rc" -eq 3 ]; then
    log "trainer exited with collapse_abort (rc=3); stopping — relaunch cannot help"
    touch "$FAIL_MARK"; exit 3
  fi
  if [ "$rc" -eq 0 ]; then
    log "trainer exited cleanly at step $ls (< $DONE_AT); treating as done"
    touch "$DONE_MARK"; exit 0
  fi

  # ---- progress accounting ----
  if [ "$ls" -le "$step_before" ]; then
    no_progress=$((no_progress + 1))
    log "no step progress since last relaunch ($no_progress consecutive)"
    if [ $no_progress -ge 3 ]; then
      log "3 consecutive zero-progress restarts; giving up (see stack dumps above)"
      touch "$FAIL_MARK"; exit 1
    fi
  else
    no_progress=0
  fi
  step_before=$ls

  # ---- backoff + probe + relaunch ----
  restarts=$((restarts + 1))
  if [ $restarts -gt 20 ]; then
    log "restart budget exhausted"; touch "$FAIL_MARK"; exit 1
  fi
  log "trainer died rc=$rc at step $ls; backing off ${backoff}s before probe"
  sleep $backoff
  backoff=$((backoff * 2)); [ $backoff -gt 600 ] && backoff=600
  until probe_tpu; do
    log "TPU probe failed (chip busy or tunnel down); waiting ${backoff}s"
    sleep $backoff
    backoff=$((backoff * 2)); [ $backoff -gt 600 ] && backoff=600
  done
  launch
done
