#!/bin/bash
# Phase 3: precision diagnostics + completeness + scale tier.
# Quick probes first (is the advection / sin_add_cos failure a precision
# artifact?), long f64 reruns last.
LOG=${1:-/tmp/sweep3.log}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  for attempt in 1 2; do
    echo "=== $desc attempt $attempt $(date +%H:%M:%S)" >> "$LOG"
    out=$(timeout 10000 "$@" 2>&1 | grep -v WARNING | tail -3)
    echo "$out" >> "$LOG"
    if ! echo "$out" | grep -qi "error\|Traceback"; then return 0; fi
    echo "  attempt $attempt failed; backing off 300s" >> "$LOG"
    sleep 300
  done
}

# -- quick diagnostics ------------------------------------------------------
run "advection mixed 2e5" python -m gphm_tpu.cli \
  --equation advection-sin --nepoch 200000 \
  --dtype mixed --quiet --out result_log_mixed
run "advection f64 2e5" python -m gphm_tpu.cli \
  --equation advection-sin --nepoch 200000 \
  --dtype float64 --quiet --out result_log_f64
run "largegrid 512" python tools/bench_largegrid.py 512 100
run "poisson_2d-sin_cos f32 1e5" python -m gphm_tpu.cli \
  --equation poisson_2d-sin_cos --nepoch 100000 --dtype float32 --quiet

# -- f64/mixed reruns of the weak f32 results --------------------------------
run "x_time_sinx f64 1e5" python -m gphm_tpu.cli \
  --equation poisson_1d-x_time_sinx --nepoch 100000 \
  --dtype float64 --quiet --out result_log_f64
run "sin_add_cos mixed 1e6" python -m gphm_tpu.cli \
  --equation poisson_2d-sin_add_cos --nepoch 1000000 \
  --dtype mixed --quiet --out result_log_mixed
run "x2_add_sinx extra mixed 1e6" python -m gphm_tpu.cli \
  --equation poisson_1d-x2_add_sinx --nepoch 1000000 --extra \
  --dtype mixed --quiet --out result_log_mixed
echo "SWEEP-PHASE3-DONE $(date +%H:%M:%S)" >> "$LOG"
