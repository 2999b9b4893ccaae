#!/bin/bash
# Round-4 master chain, v5 (supersedes r4h; r4g/r4h briefly double-ran
# the x_time leg — both were killed, this chain owns the chip alone).
#
# Leg order for the ~4.5h of round wall that remains:
#   1. x_time_sinx `ours` — the crossing-table row whose first attempt
#      starved under the static-length runner (fixed in ecdbf0a).
#   2. allencahn MAP-profiled attack (VERDICT #4): 3000 epochs vs the
#      reference's 3e6. The planned jitter-1e-6 ref leg is dropped: its
#      f32 divergence near ep 500k is already measured and documented
#      (YAML note), and the r3 j5 stream already gives the measured
#      reference crossing (3163 s @ ep 1.5e6).
#   3. sin_sin profiled + SLQ-corrected Occam (VERDICT #2 follow-up).
#   4. Quick-row reruns under the fixed runner: the sin_cos/single_sin
#      crossing walls were dominated by per-launch-length recompiles
#      (sin_cos ours: 262 s between compile-end and a 210-epoch
#      crossing); one compile per phase should collapse them.
#   5. mix_sin occam-schedule leg (VERDICT #5 direct attack; the shipped
#      default just measured 3.15e-4 with ONE rollback).
#   6. x2y2 shipped-default stream (campaign-W artifact regen).
#   7. multi-start redeem attempt (VERDICT #6) — expected to be cut.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

ref() { timeout "$1" python -m gphm_tpu.cli --no-figures \
          --reference-protocol --out result_log_r4x "${@:2}"; }
ours() { timeout "$1" python -m gphm_tpu.cli --no-figures \
          --out result_log_r4r "${@:2}"; }
run() { timeout "$1" python -m gphm_tpu.cli --no-figures "${@:2}"; }

ours 2100 --equation poisson_1d-x_time_sinx --n-evals 200
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
run 2700 --out result_log_r4z1 --equation poisson_1d-mix_sin \
    --profile-objective marginal --occam-schedule "0:0.3,1:0.7" \
    --n-evals 100
ours 2700 --equation poisson_2d-x2y2_add_sinsin --n-evals 150
run 2700 --out result_log_r4ms --equation poisson_1d-x_time_sinx \
    --multi-start 8 --multi-start-frac 0.05 --multi-start-batch 2
echo "campaign chain r4i done"
