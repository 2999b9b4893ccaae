#!/bin/bash
# Round-2 campaign, part 4: spectral-init hard-case pushes + fresh
# full-budget allencahn under round-2 numerics + CG scale verification.
LOG=${1:-/tmp/round2d.log}
cd "$(dirname "$0")/.."

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

# A: x2_add_sinx spectral-init probe — mixture GP alone, shipped budget/grid
seg fresh result_log_spec --equation poisson_1d-x2_add_sinx --quiet \
    --freq-init spectral --dtype float32 --nepoch 100000

# B: x2_add_sinx spectral + two-GP, shipped protocol (N400 cp0.01), the
# round-2 best schedule (refined head over the mixture freeze, f32 bulk,
# refined tail)
seg fresh result_log_spec --equation poisson_1d-x2_add_sinx --extra --quiet \
    --freq-init spectral --refine-logdet-iters 0 \
    --dtype-schedule "refined:0.02,float32:0.88,refined:0.1"

# C: x_time_sinx spectral (deterministic baseline is 1.83e-2)
seg fresh result_log_spec --equation poisson_1d-x_time_sinx --quiet \
    --freq-init spectral --refine-logdet-iters 0 \
    --dtype-schedule "float32:0.95,refined:0.05"

# D: fresh full-budget allencahn_2d under round-2 numerics (the round-1
# checkpoint resume crossed a numerics change and diverged)
seg resume_always result_log_ac3m --equation allencahn_2d-mix-sincos \
    --dtype float32 --jitter 1e-5 --quiet

echo "CAMPAIGN-D DONE $(date +%H:%M:%S)" >> "$LOG"
