#!/bin/bash
# Round-2 TPU campaign: serialized full-budget runs, process-per-segment
# precision schedules (the in-process dtype switch trips an axon-runtime
# CHECK, tuple_tree.cc "Index out of bounds" — see PARITY round-2 notes),
# retry + resume per segment.
LOG=${1:-/tmp/round2_campaign.log}
cd "$(dirname "$0")/.."

tpu_wait() {
  for i in $(seq 1 45); do
    if timeout 90 python -c "import jax; jax.numpy.ones((8,8)).sum().block_until_ready()" \
        >/dev/null 2>&1; then return 0; fi
    sleep 60
  done
}

# one CLI invocation with retries; resume from attempt 2 unless the first
# arg is 'resume_always' (segments after the first always resume)
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

# A: hardest 1D case, shipped config (VERDICT #1): refined head (mixture
# learning + phase switch), f32 bulk, refined tail — three processes
A_ARGS="--equation poisson_1d-x2_add_sinx --extra --quiet"
seg fresh        result_log_sched $A_ARGS --dtype refined --stop-epoch 20000
seg resume_always result_log_sched $A_ARGS --dtype float32 --stop-epoch 900000
seg resume_always result_log_sched $A_ARGS --dtype refined

# C: x_time_sinx variance case, 3 reps of f32 bulk + refined tail
for rep in 1 2 3; do
  C_ARGS="--equation poisson_1d-x_time_sinx --quiet"
  seg fresh         result_log_xts_r$rep $C_ARGS --dtype float32 --stop-epoch 95000
  seg resume_always result_log_xts_r$rep $C_ARGS --dtype refined
done

# D: method matrix (VERDICT #4) — full budget, f32
for k in SE_Cos_1d SE_1d Matern52_1d; do
  seg fresh result_log_matrix --equation poisson_1d-single_sin --kernel $k --dtype float32 --quiet
  seg fresh result_log_matrix --equation poisson_1d-sin_cos    --kernel $k --dtype float32 --quiet
  seg fresh result_log_matrix --equation poisson_2d-sin_sin    --kernel $k --dtype float32 --quiet
done

# E: finish allencahn_2d 3e6 budget from the round-1 checkpoint (VERDICT #3)
seg resume_always result_log_j5 --equation allencahn_2d-mix-sincos \
    --nepoch 3000000 --dtype float32 --jitter 1e-5 --quiet

# B: x2_add_sinx at N=900 — refined head, f32 bulk, lean refined tail
B_ARGS="--equation poisson_1d-x2_add_sinx --extra --N-col 900 --quiet"
seg fresh         result_log_sched_n900 $B_ARGS --dtype refined --stop-epoch 10000
seg resume_always result_log_sched_n900 $B_ARGS --dtype float32 --stop-epoch 970000
seg resume_always result_log_sched_n900 $B_ARGS --dtype refined

echo "CAMPAIGN DONE $(date +%H:%M:%S)" >> "$LOG"
