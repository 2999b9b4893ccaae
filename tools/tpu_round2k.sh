#!/bin/bash
# Round-2 campaign, part K: follow-ups from campaign I2's marginal-engine
# TPU results.
#   * The fixed-lr marginal tail oscillates (single_sin bounced
#     0.31 <-> 6e-4 late in its I2 run; min 2.6e-4 vs the MAP engine's
#     6.2e-6): rerun the easy 1D marginal legs with --lr-decay (cosine to
#     lr/20), the tail-stabilization knob added for exactly this.
#   * The x2_add_sinx marginal dip is cadence-limited (8.1e-3 at the
#     n-evals=150 cadence, trough clearly between evals 10667..10933):
#     rerun at n-evals 400, with and without decay.
LOG=${1:-/tmp/round2k.log}
cd "$(dirname "$0")/.."

# queue behind a running campaign (pid as $2)
FPID=${2:-}
if [ -n "$FPID" ]; then
  while [ -e "/proc/$FPID" ]; do sleep 60; done
fi

tpu_wait() {
  for i in $(seq 1 45); do
    if timeout 90 python -c "import jax; jax.numpy.ones((8,8)).sum().block_until_ready()" \
        >/dev/null 2>&1; then return 0; fi
    sleep 60
  done
}

seg() {
  out=$1; shift
  for attempt in 1 2 3; do
    extra=""
    [ $attempt -gt 1 ] && extra="--resume"
    echo "=== [$out] $* (attempt $attempt $extra) $(date +%H:%M:%S)" >> "$LOG"
    res=$(timeout 10000 python -m gphm_tpu.cli --out "$out" --no-figures \
          "$@" $extra 2>&1 | grep -vE "WARNING|symbolize|RAW:|    @|0x7|cpu_aot|^E08" | tail -4)
    echo "$res" >> "$LOG"
    if echo "$res" | grep -q "err mean"; then return 0; fi
    echo "  attempt $attempt failed; waiting for TPU recovery" >> "$LOG"
    tpu_wait
  done
  echo "  GAVE UP on [$out] $*" >> "$LOG"
  return 1
}

# K1 (already run 06:54, result_log_k): x2_add_sinx marginal at n-evals
# 400 bottomed at the SAME 8.11265e-3 as I2's 133-epoch cadence — the dip
# trough is flat at this scale; cadence was not the limiter.

# K2: same with the cosine lr decay (phase-2 tail descends at ~lr/10)
seg result_log_k_decay --equation poisson_1d-x2_add_sinx --extra --quiet \
    --u-mode profiled --dtype refined --freq-init spectral \
    --change-point 0.5 --nepoch 20000 --n-evals 400 --lr-decay 0.05

# K3/K4: easy 1D marginal legs with the decayed tail
seg result_log_k_decay --equation poisson_1d-single_sin --quiet \
    --u-mode profiled --dtype refined --nepoch 6000 --n-evals 30 \
    --lr-decay 0.05
seg result_log_k_decay --equation poisson_1d-sin_cos --quiet \
    --u-mode profiled --dtype refined --nepoch 6000 --n-evals 30 \
    --lr-decay 0.05

# K5: mix_sin marginal two-GP + SPECTRAL INIT + decay. The I2 pattern:
# the marginal (evidence) objective reached 8.1e-3 on x2_add_sinx WITH
# spectral init but plateaued at 0.089/0.090 on mix_sin/x_time_sinx
# WITHOUT it — evidence maximization does not pull mixture components
# onto weak high-frequency lines (it happily explains them as residual
# noise), but keeps components there once placed.
seg result_log_k_decay --equation poisson_1d-mix_sin --extra --quiet \
    --u-mode profiled --dtype refined --freq-init spectral \
    --change-point 0.5 --nepoch 20000 --n-evals 400 --lr-decay 0.05

# K6: x_time_sinx marginal + spectral init (I2 no-spectral: 9.0e-2;
# campaign-G MAP+spectral analog: 2.4e-3)
seg result_log_k_decay --equation poisson_1d-x_time_sinx --quiet \
    --u-mode profiled --dtype refined --freq-init spectral \
    --nepoch 10000 --n-evals 50 --lr-decay 0.05

echo "CAMPAIGN-K DONE $(date +%H:%M:%S)" >> "$LOG"
