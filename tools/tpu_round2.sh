#!/bin/bash
# Round-2 TPU campaign: serialized full-budget runs with retry + resume.
# Each run retries up to 3 times; --resume picks up the rolling checkpoint,
# so a TPU-worker crash costs at most one eval interval.
LOG=${1:-/tmp/round2_campaign.log}
cd "$(dirname "$0")/.."

run() {
  out=$1; shift
  tag="$*"
  for attempt in 1 2 3; do
    extra=""
    [ $attempt -gt 1 ] && extra="--resume"
    echo "=== [$out] $tag (attempt $attempt $extra) $(date +%H:%M:%S)" >> "$LOG"
    res=$(timeout 14000 python -m gphm_tpu.cli --out "$out" --no-figures \
          "$@" $extra 2>&1 | grep -v WARNING | tail -3)
    echo "$res" >> "$LOG"
    if echo "$res" | grep -q "err mean"; then return 0; fi
    echo "  attempt $attempt failed; waiting for TPU recovery" >> "$LOG"
    # wait until the device answers again before retrying
    for i in $(seq 1 40); do
      if timeout 90 python -c "import jax; jax.numpy.ones((8,8)).sum().block_until_ready()" \
          >/dev/null 2>&1; then break; fi
      sleep 60
    done
  done
  echo "  GAVE UP on [$out] $tag" >> "$LOG"
}

# A: hardest 1D case, shipped config — refined phase-1 head (mixture
# learning), f32 bulk, refined tail (VERDICT #1)
run result_log_sched --equation poisson_1d-x2_add_sinx --extra --quiet \
    --dtype-schedule refined:0.02,float32:0.88,refined:0.1

# B: same at N_col=900 (11 points/cycle; round-1 f32 reached 1.7e-2)
run result_log_sched_n900 --equation poisson_1d-x2_add_sinx --extra --quiet \
    --N-col 900 --dtype-schedule refined:0.01,float32:0.96,refined:0.03

# C: x_time_sinx f32-floor variance case, 3 repetitions of the same
# schedule (VERDICT #10: pin down the run-to-run spread)
for rep in 1 2 3; do
  run result_log_xts_r$rep --equation poisson_1d-x_time_sinx --quiet \
      --dtype-schedule float32:0.95,refined:0.05
done

# D: method matrix — the reference's four methods (GP-HM-GM = SE_Cos,
# GP-HM-Stm = Matern52_Cos [already measured], GP-SE, GP-Matern) at full
# budget on three anchor equations (VERDICT #4)
for k in SE_Cos_1d SE_1d Matern52_1d; do
  run result_log_matrix --equation poisson_1d-single_sin --kernel $k \
      --dtype float32 --quiet
  run result_log_matrix --equation poisson_1d-sin_cos --kernel $k \
      --dtype float32 --quiet
  run result_log_matrix --equation poisson_2d-sin_sin --kernel $k \
      --dtype float32 --quiet
done

# E: finish the allencahn_2d 3e6 budget from the round-1 checkpoint at 2.7M
# (VERDICT #3)
echo "=== [result_log_j5] allencahn resume $(date +%H:%M:%S)" >> "$LOG"
timeout 7200 python -m gphm_tpu.cli --equation allencahn_2d-mix-sincos \
    --nepoch 3000000 --dtype float32 --jitter 1e-5 --out result_log_j5 \
    --no-figures --quiet --resume 2>&1 | grep -v WARNING | tail -3 >> "$LOG"

echo "CAMPAIGN DONE $(date +%H:%M:%S)" >> "$LOG"
