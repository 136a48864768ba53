#!/bin/bash
# Wait (bounded) for the axon tunnel to answer a tiny matmul, then hand off
# to quality_watchdog3.sh. Used when the tunnel stalls mid-run: kill the
# wedged trainer, run this, and the run resumes as soon as the chip is back.
# Env: same as quality_watchdog3.sh; PROBE_MAX_S caps the wait (default 3600).
set -u
LOG=${QR_LOG:?}
MAX=${PROBE_MAX_S:-3600}
t0=$(date +%s)
note() { echo "prober[$(date +%H:%M:%S)]: $*" >> "$LOG"; }

note "waiting for TPU to answer (max ${MAX}s)"
while true; do
  # -k: follow the TERM with a KILL — a probe wedged in a stalled device
  # call can ignore SIGTERM indefinitely, defeating the bounded wait
  if timeout -k 10 60 python - >/dev/null 2>&1 <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); float((x @ x).sum())
EOF
  then
    note "TPU answered; starting watchdog"
    exec bash /root/repo/scripts/quality_watchdog3.sh
  fi
  now=$(date +%s)
  if [ $((now - t0)) -gt "$MAX" ]; then
    note "TPU never answered within ${MAX}s; giving up"
    exit 1
  fi
  sleep 45
done
