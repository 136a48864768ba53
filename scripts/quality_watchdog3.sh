#!/bin/bash
# Thin shim over the in-framework supervisor (train/supervisor.py) —
# kept so existing tooling (probe_then_watchdog.sh, runbooks) that execs
# this script keeps working. All policy lives in the Python module now:
# stall stack-dump + kill, chip probe before (re)launch, exponential
# backoff, collapse-abort (exit 3) terminal, zero-progress give-up,
# TRAIN_DONE / TRAIN_FAILED markers next to the log.
# Env: QR_LOG, QR_STEPS, plus QR_ROOT/QR_EXP/QR_PRESET/QR_HP passed
# through to run_quality_train.py.
set -u
LOG=${QR_LOG:-/root/repo/quality/train.log}
STEPS=${QR_STEPS:-40000}
cd /root/repo   # package not installed; module import is cwd-relative
exec python -m wavenet_autoencoders_tpu.train.supervisor \
  --steps "$STEPS" --log "$LOG" \
  -- python /root/repo/scripts/run_quality_train.py
