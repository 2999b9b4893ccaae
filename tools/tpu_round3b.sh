#!/bin/bash
# Round-3 campaign S: --multi-start where it was aimed (VERDICT r2 #4) —
# the marginal profiled engine on the configs whose phase-1 evidence ascent
# keeps spectral lines it cannot find from a single init (campaign I2
# finding 1). Goal: mix_sin profiled-marginal <= 3.3e-4 (the MAP hedge's
# pre-cliff number) without relying on the cliff+rollback.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"
OUT=result_log_r3ms

run() { timeout 14400 python -m gphm_tpu.cli --out "$OUT" --no-figures "$@"; }

# mix_sin: shipped two-GP profiled, marginal objective + 8-start warmup
# (warmup 5% = 1500 epochs, inside the 15k change point)
run --equation poisson_1d-mix_sin --profile-objective marginal \
    --multi-start 8 --multi-start-frac 0.05

# x_time_sinx: shipped profiled+spectral+decay + 8-start warmup
run --equation poisson_1d-x_time_sinx --multi-start 8 --multi-start-frac 0.05
echo "campaign S done"
