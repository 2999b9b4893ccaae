#!/bin/bash
# Round-4 master chain (supersedes r4a X-legs / r4b / r4c ordering):
# priority-ordered so that every completed (reference-stream, our-stream)
# PAIR immediately yields one full row of the time-to-tolerance table
# (r3 VERDICT #3 — the single "missing" item), cheapest rows first.
# Campaign W (r4a) already completed and is recorded in PARITY; its legs
# are not repeated here.
#
# Phase 1 — the measured crossing table:
#   ref  = --reference-protocol at dense eval cadence. Trajectory parity
#          is pinned to ~1e-13 (tests/test_reference_parity.py), so the
#          crossing EPOCH is the reference's own; tools/time_to_tolerance
#          converts epoch -> reference wall via the shipped per-epoch
#          walls (reference log.txt:2). Caps are wall-clock guards; a
#          truncated stream still yields every crossing it reached
#          (metrics_fold0.jsonl is written as the run goes).
#   ours = the bare shipped config (campaign-proven engine defaults) at
#          dense cadence — regenerates the streams the round-3 rotation
#          wiped, at the budgets pinned by tests/test_config_defaults.py.
#
# Phase 2 — experimental legs, in VERDICT order:
#   Z1/Z3 (VERDICT #5): mix_sin evidence tempering vs the rollback cliff.
#   AC1   (VERDICT #4): allencahn_2d MAP-profiled attack.
#   Y2    (VERDICT #1/#2 follow-up): SLQ-corrected marginal on sin_sin.
#   AC2   (VERDICT #4): allencahn marginal + tempering variant.
#   V-retry (VERDICT #6): regenerate the multi-start negative artifacts.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

ref() { timeout "$1" python -m gphm_tpu.cli --no-figures \
          --reference-protocol --out result_log_r4x "${@:2}"; }
ours() { timeout "$1" python -m gphm_tpu.cli --no-figures \
          --out result_log_r4r "${@:2}"; }
run() { timeout "$1" python -m gphm_tpu.cli --no-figures "${@:2}"; }

# --- Phase 1: crossing-table pairs, cheapest first ---------------------
ref  1200 --equation poisson_1d-single_sin --n-evals 400
ours 1200 --equation poisson_1d-single_sin --n-evals 200
ref  1200 --equation poisson_1d-sin_cos --n-evals 400
ours 1500 --equation poisson_1d-sin_cos --n-evals 200
ref  1200 --equation poisson_2d-sin_sin --n-evals 200
ours 1200 --equation poisson_2d-sin_sin --n-evals 200
ours 1800 --equation advection-sin --n-evals 200
ref  4500 --equation advection-sin --n-evals 400
ref  2700 --equation poisson_1d-x_time_sinx --n-evals 400
ours 3600 --equation poisson_1d-x_time_sinx --n-evals 200
ref  2700 --equation poisson_1d-mix_sin --n-evals 400
ours 4200 --equation poisson_1d-mix_sin --n-evals 200
ref  5400 --equation allencahn_2d-mix-sincos --n-evals 300
ours 4500 --equation allencahn_2d-mix-sincos --n-evals 200

# --- Phase 2: experimental legs ----------------------------------------
run 3600 --out result_log_r4z1 --equation poisson_1d-mix_sin \
    --profile-objective marginal --occam-schedule "0:0.3,1:0.7" \
    --n-evals 100
run 5400 --out result_log_r4ac1 --equation allencahn_2d-mix-sincos \
    --u-mode profiled --profile-objective map --dtype refined \
    --freq-init spectral --profile-newton-iters 6 --profile-cg-iters 100 \
    --lr-decay 0.1 --nepoch 3000 --n-evals 150
run 5400 --out result_log_r4y2 --equation poisson_2d-sin_sin \
    --u-mode profiled --dtype refined --freq-init spectral \
    --profile-cg-iters 100 --lr-decay 0.1 --occam-2d slq \
    --nepoch 1000 --n-evals 100
run 3600 --out result_log_r4z3 --equation poisson_1d-mix_sin \
    --profile-objective marginal --occam-schedule "0:0.3,0.3:0.7" \
    --n-evals 100
run 5400 --out result_log_r4ac2 --equation allencahn_2d-mix-sincos \
    --u-mode profiled --profile-objective marginal --dtype refined \
    --freq-init spectral --profile-newton-iters 6 --profile-cg-iters 100 \
    --lr-decay 0.1 --occam-schedule "0:0.3,1:0.7" \
    --nepoch 3000 --n-evals 150
run 3600 --out result_log_r4ms --equation poisson_1d-x_time_sinx \
    --multi-start 8 --multi-start-frac 0.05 --multi-start-batch 2
echo "campaign chain r4d done"
