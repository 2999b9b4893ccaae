#!/bin/bash
# Round-4 master chain, v6 (final; supersedes r4i after its x_time leg).
#
# Adds the mix_sin reference-protocol RESUME leg: the r4x stream stopped
# at epoch 222,500 of 1e6 — BEFORE the two-GP change point at 500k, so
# its 2.01e-2 floor is phase-1-only evidence and the reference's
# "1e-3..1e-4" claim lives in phase 2. Resuming from the rolling
# checkpoint (~4.6 ms/epoch measured) reaches the full budget in one
# 3600 s leg and converts the crossing-table `>` bound into a measured
# reference crossing (or a measured full-budget refusal).
#
# $1: PID of the draining x_time leg to wait on.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

ref() { timeout "$1" python -m gphm_tpu.cli --no-figures \
          --reference-protocol --out result_log_r4x "${@:2}"; }
ours() { timeout "$1" python -m gphm_tpu.cli --no-figures \
          --out result_log_r4r "${@:2}"; }
run() { timeout "$1" python -m gphm_tpu.cli --no-figures "${@:2}"; }

run 3600 --out result_log_r4ac1 --equation allencahn_2d-mix-sincos \
    --u-mode profiled --profile-objective map --dtype refined \
    --freq-init spectral --profile-newton-iters 6 --profile-cg-iters 100 \
    --lr-decay 0.1 --nepoch 3000 --n-evals 150
run 3600 --out result_log_r4y2 --equation poisson_2d-sin_sin \
    --u-mode profiled --dtype refined --freq-init spectral \
    --profile-cg-iters 100 --lr-decay 0.1 --occam-2d slq \
    --nepoch 1000 --n-evals 100
ref  420  --equation poisson_1d-sin_cos --n-evals 400
ours 900  --equation poisson_1d-sin_cos --n-evals 200
ours 900  --equation poisson_1d-single_sin --n-evals 200
ref  3600 --equation poisson_1d-mix_sin --n-evals 400 --resume
run 2700 --out result_log_r4z1 --equation poisson_1d-mix_sin \
    --profile-objective marginal --occam-schedule "0:0.3,1:0.7" \
    --n-evals 100
ours 2700 --equation poisson_2d-x2y2_add_sinsin --n-evals 150
run 2700 --out result_log_r4ms --equation poisson_1d-x_time_sinx \
    --multi-start 8 --multi-start-frac 0.05 --multi-start-batch 2
echo "campaign chain r4j done"
