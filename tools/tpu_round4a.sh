#!/bin/bash
# Round-4 campaign chain A = W-redo + X, serialized on the single chip.
#
#  W (round-3 VERDICT #1): the MAP-profiled 2D Poisson legs that were
#    aborted mid-run at round-3 snapshot (x2y2 was at rel-L2 0.0223 @
#    epoch 1400/1500 vs the shipped marginal default's 0.0797 when the
#    round ended; the sin_sin MAP leg never started). Rollback armed via
#    the default nan-policy; the new two-eval banded trigger applies.
#  X (round-3 VERDICT #3): reference-protocol dense-cadence streams so
#    tools/time_to_tolerance.py has MEASURED adam crossings per headline
#    equation (trajectory parity is pinned to ~1e-13 against the
#    reference solvers, tests/test_reference_parity.py, so the crossing
#    epoch IS the reference's). Budgets are the reference's own
#    (run_1d.sh / run_2d.sh) via the fixed reference_overrides; the
#    allencahn 3e6 stream is capped at 2h — crossings happen well
#    before the cap, and the cap is recorded honestly by the tool.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

run() { timeout "$1" python -m gphm_tpu.cli --no-figures "${@:2}"; }

# --- W: 2D MAP-profiled legs ------------------------------------------
run 9000 --out result_log_r4w --equation poisson_2d-x2y2_add_sinsin \
    --profile-objective map --nepoch 1500 --n-evals 75
run 9000 --out result_log_r4w --equation poisson_2d-sin_sin \
    --u-mode profiled --profile-objective map --dtype refined \
    --freq-init spectral --profile-cg-iters 100 --lr-decay 0.1 \
    --nepoch 1500 --n-evals 75

# --- X: reference-protocol baseline streams ---------------------------
refrun() { timeout "$1" python -m gphm_tpu.cli --no-figures \
             --reference-protocol --out result_log_r4x "${@:2}"; }
refrun 900  --equation poisson_1d-single_sin --n-evals 400
refrun 900  --equation poisson_1d-sin_cos --n-evals 400
refrun 900  --equation poisson_1d-x_time_sinx --n-evals 400
refrun 4500 --equation advection-sin --n-evals 400
refrun 4500 --equation poisson_2d-sin_sin --n-evals 200
refrun 4500 --equation poisson_1d-mix_sin --n-evals 400
refrun 7200 --equation allencahn_2d-mix-sincos --n-evals 300
echo "campaign chain r4a done"
