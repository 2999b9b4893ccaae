#!/bin/bash
# Phase 3: diagnostics + completeness + scale tier.
#  - x2_add_sinx extra in f64 (same wall speed as f32 on this chip) to see
#    whether the 0.52 plateau is precision-related
#  - x_time_sinx in f64 (weakest 1D f32 result, 6.1e-3)
#  - poisson_2d-sin_cos (whitelisted equation the reference ships no yaml for)
#  - 512^2 large-grid benchmark (dense Kronecker vs CG)
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

run "x2_add_sinx extra f64" python -m gphm_tpu.cli \
  --equation poisson_1d-x2_add_sinx --nepoch 1000000 --extra \
  --dtype float64 --quiet --out result_log_f64
run "x_time_sinx f64" python -m gphm_tpu.cli \
  --equation poisson_1d-x_time_sinx --nepoch 100000 \
  --dtype float64 --quiet --out result_log_f64
run "poisson_2d-sin_add_cos f64" python -m gphm_tpu.cli \
  --equation poisson_2d-sin_add_cos --nepoch 1000000 \
  --dtype float64 --quiet --out result_log_f64
run "advection f64" python -m gphm_tpu.cli \
  --equation advection-sin --nepoch 200000 \
  --dtype float64 --quiet --out result_log_f64
run "poisson_2d-sin_cos f32" python -m gphm_tpu.cli \
  --equation poisson_2d-sin_cos --nepoch 100000 --dtype float32 --quiet
run "largegrid 512" python tools/bench_largegrid.py 512 100
echo "SWEEP-PHASE3-DONE $(date +%H:%M:%S)" >> "$LOG"
