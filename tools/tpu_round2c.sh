#!/bin/bash
# Round-2 campaign, part 3 (time-boxed): the N=900 change_point=0.5 run
# (the 1e-3-band attempt), then the fast coverage runs.
LOG=${1:-/tmp/round2c.log}
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

# B': x2_add_sinx N=900, change_point=0.5 (round-1's improved protocol,
# PARITY round-1 notes) — f32 bulk, refined tail with f32 logdet gradient
seg fresh result_log_n900_cp05 --equation poisson_1d-x2_add_sinx --extra \
    --N-col 900 --change-point 0.5 --refine-logdet-iters 0 \
    --dtype-schedule float32:0.98,refined:0.02 --quiet

# D: method matrix — full budget, f32
for k in SE_Cos_1d SE_1d Matern52_1d; do
  seg fresh result_log_matrix --equation poisson_1d-single_sin --kernel $k --dtype float32 --quiet
  seg fresh result_log_matrix --equation poisson_1d-sin_cos    --kernel $k --dtype float32 --quiet
  seg fresh result_log_matrix --equation poisson_2d-sin_sin    --kernel $k --dtype float32 --quiet
done

# E: finish allencahn_2d 3e6 budget from the round-1 checkpoint
seg resume_always result_log_j5 --equation allencahn_2d-mix-sincos \
    --nepoch 3000000 --dtype float32 --jitter 1e-5 --quiet

# C: x_time_sinx variance reps (f32 bulk + refined tail)
for rep in 1 2; do
  seg fresh result_log_xts_r$rep --equation poisson_1d-x_time_sinx --quiet \
      --refine-logdet-iters 0 --dtype-schedule float32:0.95,refined:0.05
done

echo "CAMPAIGN-C DONE $(date +%H:%M:%S)" >> "$LOG"
