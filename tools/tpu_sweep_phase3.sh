#!/bin/bash
# Phase 3: re-run the configs whose phase-1/2 numbers were corrupted by
# f32 prediction-time solves (training was correct; evaluations misreported
# — fixed by widening eval solves to f64), plus completeness + scale tier.
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

run "advection f32 2e5 (honest evals)" python -m gphm_tpu.cli \
  --equation advection-sin --nepoch 200000 --dtype float32 --quiet
run "x_time_sinx f32 1e5 (honest evals)" python -m gphm_tpu.cli \
  --equation poisson_1d-x_time_sinx --nepoch 100000 --dtype float32 --quiet
run "largegrid 512" python tools/bench_largegrid.py 512 100
run "poisson_2d-sin_cos f32 1e5" python -m gphm_tpu.cli \
  --equation poisson_2d-sin_cos --nepoch 100000 --dtype float32 --quiet
run "sin_add_cos f32 1e6 (honest evals)" python -m gphm_tpu.cli \
  --equation poisson_2d-sin_add_cos --nepoch 1000000 --dtype float32 --quiet
run "x2_add_sinx extra f32 1e6 (honest evals + early stop)" \
  python -m gphm_tpu.cli --equation poisson_1d-x2_add_sinx \
  --nepoch 1000000 --extra --dtype float32 --quiet
run "x2_add_sinx extra cp=0.5 (base GP gets 500k epochs)" \
  python -m gphm_tpu.cli --equation poisson_1d-x2_add_sinx \
  --nepoch 1000000 --extra --change-point 0.5 --dtype float32 --quiet \
  --out result_log_cp05
run "allencahn_2d mixed 3e6 (f32 diverged to NaN at ~500k)" \
  python -m gphm_tpu.cli --equation allencahn_2d-mix-sincos \
  --nepoch 3000000 --dtype mixed --quiet
echo "SWEEP-PHASE3-DONE $(date +%H:%M:%S)" >> "$LOG"
