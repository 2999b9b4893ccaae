#!/bin/bash
# Round-2 campaign, part 6 (replaces parts 4/5 tail): dense-cadence
# hard-case runs first (short; early stop fires near the post-switch dip),
# then the fresh full-budget allencahn, then scale-tier verification.
LOG=${1:-/tmp/round2f.log}
cd "$(dirname "$0")/.."

# wait for the in-flight x_time_sinx spectral run (campaign-D orphan)
while pgrep -x -f "x-IGNORE-x" >/dev/null 2>&1; do :; done  # no-op guard
while [ -n "$(ls /proc/31059/cmdline 2>/dev/null)" ]; do sleep 30; done

tpu_wait() {
  for i in $(seq 1 45); do
    if timeout 90 python -c "import jax; jax.numpy.ones((8,8)).sum().block_until_ready()" \
        >/dev/null 2>&1; then return 0; fi
    sleep 60
  done
}

seg() {
  mode=$1; out=$2; shift 2
  for attempt in 1 2 3; do
    extra=""
    { [ "$mode" = resume_always ] || [ $attempt -gt 1 ]; } && extra="--resume"
    echo "=== [$out] $* (attempt $attempt $extra) $(date +%H:%M:%S)" >> "$LOG"
    res=$(timeout 10000 python -m gphm_tpu.cli --out "$out" --no-figures \
          "$@" $extra 2>&1 | grep -vE "WARNING|symbolize|RAW:|    @|0x7" | tail -4)
    echo "$res" >> "$LOG"
    if echo "$res" | grep -q "err mean"; then return 0; fi
    echo "  attempt $attempt failed; waiting for TPU recovery" >> "$LOG"
    tpu_wait
  done
  echo "  GAVE UP on [$out] $*" >> "$LOG"
  return 1
}

# F1: x2_add_sinx shipped protocol + spectral + refined head, dense cadence
seg fresh result_log_dense --equation poisson_1d-x2_add_sinx --extra --quiet \
    --freq-init spectral --n-evals 200 --refine-logdet-iters 0 \
    --dtype-schedule "refined:0.02,float32:0.88,refined:0.1"

# F2: same protocol without spectral (isolates the cadence effect on the
# round-2 best 4.4e-2 configuration)
seg fresh result_log_dense2 --equation poisson_1d-x2_add_sinx --extra --quiet \
    --n-evals 200 --refine-logdet-iters 0 \
    --dtype-schedule "refined:0.02,float32:0.88,refined:0.1"

# F3: mix_sin (reference's 1e-3..1e-4 flagship hard case) + spectral +
# refined tail, dense cadence
seg fresh result_log_dense --equation poisson_1d-mix_sin --extra --quiet \
    --freq-init spectral --n-evals 100 --refine-logdet-iters 0 \
    --dtype-schedule "float32:0.98,refined:0.02"

# F4: fresh full-budget allencahn_2d under round-2 numerics (reference
# protocol/cadence for the parity table)
seg resume_always result_log_ac3m --equation allencahn_2d-mix-sincos \
    --dtype float32 --jitter 1e-5 --quiet

# F5: scale-tier verification
echo "=== largegrid 512^2, 2x5000 steps = 10k epochs $(date +%H:%M:%S)" >> "$LOG"
timeout 4000 python tools/bench_largegrid.py 512 5000 >> "$LOG" 2>&1
echo "=== largegrid 1024^2 stretch $(date +%H:%M:%S)" >> "$LOG"
timeout 4000 python tools/bench_largegrid.py 1024 100 >> "$LOG" 2>&1
echo "=== bench.py final $(date +%H:%M:%S)" >> "$LOG"
timeout 2000 python bench.py >> "$LOG" 2>&1

echo "CAMPAIGN-F DONE $(date +%H:%M:%S)" >> "$LOG"
