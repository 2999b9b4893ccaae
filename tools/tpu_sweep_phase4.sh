#!/bin/bash
# Phase 4: leftovers — the fixed large-grid benchmark, mixed-precision rerun
# of the variance-prone x_time_sinx, and a full-budget (1e6) run of the
# bonus poisson_2d-sin_cos config (still descending at 1e5).
LOG=${1:-/tmp/sweep4.log}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  for attempt in 1 2; do
    echo "=== $desc attempt $attempt $(date +%H:%M:%S)" >> "$LOG"
    out=$(timeout 9000 "$@" 2>&1 | grep -v WARNING | tail -3)
    echo "$out" >> "$LOG"
    if ! echo "$out" | grep -qi "error\|Traceback"; then return 0; fi
    echo "  attempt $attempt failed; backing off 300s" >> "$LOG"
    sleep 300
  done
}

run "largegrid 512" python tools/bench_largegrid.py 512 100
run "x_time_sinx mixed 1e5" python -m gphm_tpu.cli \
  --equation poisson_1d-x_time_sinx --nepoch 100000 \
  --dtype mixed --quiet --out result_log_mixed
run "poisson_2d-sin_cos f32 1e6" python -m gphm_tpu.cli \
  --equation poisson_2d-sin_cos --nepoch 1000000 --dtype float32 --quiet
run "x2_add_sinx extra mixed 1e6" python -m gphm_tpu.cli \
  --equation poisson_1d-x2_add_sinx --nepoch 1000000 --extra \
  --dtype mixed --quiet --out result_log_mixed
echo "SWEEP-PHASE4-DONE $(date +%H:%M:%S)" >> "$LOG"
