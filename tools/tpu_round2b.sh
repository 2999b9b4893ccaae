#!/bin/bash
# Round-2 campaign, part 2: B first (the 1e-3-band target), then the short
# runs. Same retry+resume scheme as tools/tpu_round2.sh.
LOG=${1:-/tmp/round2_campaign.log}
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
    res=$(timeout 14000 python -m gphm_tpu.cli --out "$out" --no-figures \
          "$@" $extra 2>&1 | grep -vE "WARNING|symbolize|RAW:|    @|0x7" | tail -4)
    echo "$res" >> "$LOG"
    if echo "$res" | grep -q "err mean"; then return 0; fi
    echo "  attempt $attempt failed; waiting for TPU recovery" >> "$LOG"
    tpu_wait
  done
  echo "  GAVE UP on [$out] $*" >> "$LOG"
  return 1
}

# B: x2_add_sinx at N=900 (11 points/cycle) — refined head through phase 1,
# f32 bulk, refined tail
B_ARGS="--equation poisson_1d-x2_add_sinx --extra --N-col 900 --quiet"
seg fresh         result_log_sched_n900 $B_ARGS --dtype refined --stop-epoch 12000
seg resume_always result_log_sched_n900 $B_ARGS --dtype float32 --stop-epoch 970000
seg resume_always result_log_sched_n900 $B_ARGS --dtype refined

# C: x_time_sinx variance case, 3 reps (f32 bulk + refined tail)
for rep in 1 2 3; do
  C_ARGS="--equation poisson_1d-x_time_sinx --quiet"
  seg fresh         result_log_xts_r$rep $C_ARGS --dtype float32 --stop-epoch 95000
  seg resume_always result_log_xts_r$rep $C_ARGS --dtype refined
done

# D: method matrix — full budget, f32
for k in SE_Cos_1d SE_1d Matern52_1d; do
  seg fresh result_log_matrix --equation poisson_1d-single_sin --kernel $k --dtype float32 --quiet
  seg fresh result_log_matrix --equation poisson_1d-sin_cos    --kernel $k --dtype float32 --quiet
  seg fresh result_log_matrix --equation poisson_2d-sin_sin    --kernel $k --dtype float32 --quiet
done

# E: finish allencahn_2d 3e6 budget from the round-1 checkpoint
seg resume_always result_log_j5 --equation allencahn_2d-mix-sincos \
    --nepoch 3000000 --dtype float32 --jitter 1e-5 --quiet

echo "CAMPAIGN-B DONE $(date +%H:%M:%S)" >> "$LOG"
