#!/bin/bash
# Phase 2: the long-budget reference configs — hard 1D cases with the
# two-GP trick (reference: run_1d.sh:43-45) and the 1e6/3e6-epoch 2D cases
# (reference: run_2d.sh:23-27). Direct attempts with long backoff (no
# health probes — dead probe clients pin the device grant queue).
LOG=${1:-/tmp/sweep2.log}
cd "$(dirname "$0")/.."

run() {
  eq=$1; ep=$2; shift 2
  for attempt in 1 2 3; do
    echo "=== $eq ($ep epochs) $* attempt $attempt $(date +%H:%M:%S)" >> "$LOG"
    out=$(timeout 14000 python -m gphm_tpu.cli --equation "$eq" --nepoch "$ep" \
      --dtype float32 --quiet "$@" 2>&1 | grep -v WARNING | tail -2)
    echo "$out" >> "$LOG"
    if echo "$out" | grep -q "err mean"; then return 0; fi
    echo "  attempt $attempt failed; backing off 300s" >> "$LOG"
    sleep 300
  done
  echo "  GAVE UP on $eq" >> "$LOG"
}

run poisson_1d-mix_sin 1000000 --extra
run poisson_1d-x2_add_sinx 1000000 --extra
run poisson_2d-sin_add_cos 1000000
run advection-sin 1000000
run allencahn_2d-mix-sincos 3000000
echo "SWEEP-PHASE2-DONE $(date +%H:%M:%S)" >> "$LOG"
