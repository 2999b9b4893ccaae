#!/bin/bash
# Resilient TPU validation sweep: run each reference config at its full
# epoch budget. No separate health probes — dead probe clients pin the
# device grant queue; instead each run is attempted directly with a long
# backoff between retries so stale leases can clear.
LOG=${1:-/tmp/sweep.log}
cd "$(dirname "$0")/.."

run() {
  eq=$1; ep=$2; shift 2
  for attempt in 1 2 3; do
    echo "=== $eq ($ep epochs) $* attempt $attempt $(date +%H:%M:%S)" >> "$LOG"
    out=$(timeout 7200 python -m gphm_tpu.cli --equation "$eq" --nepoch "$ep" \
      --dtype float32 --quiet "$@" 2>&1 | grep -v WARNING | tail -2)
    echo "$out" >> "$LOG"
    if echo "$out" | grep -q "err mean"; then return 0; fi
    echo "  attempt $attempt failed; backing off 300s" >> "$LOG"
    sleep 300
  done
  echo "  GAVE UP on $eq" >> "$LOG"
}

run poisson_1d-sin_cos 100000
run allencahn_1d-single_sin 100000
run allencahn_1d-sin_cos 100000
run poisson_1d-x_time_sinx 100000
run poisson_2d-sin_sin 100000
run advection-sin 200000
echo "SWEEP-PHASE1-DONE $(date +%H:%M:%S)" >> "$LOG"
