#!/bin/bash
# Resilient TPU validation sweep: run each reference config at its full
# epoch budget, with a device health check (and recovery wait) between runs.
# Usage: bash tools/tpu_sweep.sh [logfile]
LOG=${1:-/tmp/sweep.log}
cd "$(dirname "$0")/.."

health() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
print('HEALTH-OK', float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))
" 2>/dev/null | grep -q HEALTH-OK
}

wait_healthy() {
  for i in $(seq 1 30); do
    if health; then return 0; fi
    echo "  device unhealthy, waiting ($i)..." >> "$LOG"
    sleep 30
  done
  return 1
}

run() {
  eq=$1; ep=$2; shift 2
  echo "=== $eq ($ep epochs) $(date +%H:%M:%S)" >> "$LOG"
  wait_healthy || { echo "  SKIPPED: device down" >> "$LOG"; return; }
  timeout 7200 python -m gphm_tpu.cli --equation "$eq" --nepoch "$ep" \
    --dtype float32 --quiet "$@" 2>&1 | grep -v WARNING | tail -2 >> "$LOG"
}

run poisson_1d-single_sin 100000
run poisson_1d-sin_cos 100000
run allencahn_1d-single_sin 100000
run allencahn_1d-sin_cos 100000
run poisson_1d-x_time_sinx 100000
run poisson_2d-sin_sin 100000
run advection-sin 200000
echo "SWEEP-PHASE1-DONE $(date +%H:%M:%S)" >> "$LOG"
