#!/bin/bash
# Round-3 campaign chain H = V-retry + W + X, serialized (the parallel
# launch of campaigns V/W/X contended for the single chip; this replaces
# tpu_round3e/f/g as one sequential stream).
#
#  1. V-retry: x_time_sinx multi-start (the r3d leg died on a tunnel
#     read error mid-sweep, not an OOM — plain retry).
#  2. W: MAP-profiled probes on the 2D Poisson family (r2 VERDICT #3:
#     sin_sin <= 1.5e-3 at <= 1/5 budget, or a measured impossibility
#     note; marginal plateaus at 0.175 / x2y2 0.08).
#  3. X: reference-protocol dense-cadence streams so
#     tools/time_to_tolerance.py has measured adam crossings per
#     headline equation (trajectory parity is pinned to ~1e-13, so the
#     crossing epoch IS the reference's).
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

run() { timeout "$1" python -m gphm_tpu.cli --no-figures "${@:2}"; }

# --- V-retry -----------------------------------------------------------
run 10800 --out result_log_r3ms --equation poisson_1d-x_time_sinx \
    --multi-start 8 --multi-start-frac 0.05 --multi-start-batch 2

# (No second mix_sin leg: MAP+decay and marginal two-GP are both already
# measured at 2.8e-2 — campaigns K/L — and the marginal multi-start leg
# running now shows the walk-away mechanism multi-start cannot fix;
# recorded as a negative result in PARITY campaign V.)

# --- W: 2D MAP-profiled probes ----------------------------------------
run 10800 --out result_log_r3w --equation poisson_2d-x2y2_add_sinsin \
    --profile-objective map --nepoch 1500 --n-evals 75
run 10800 --out result_log_r3w --equation poisson_2d-sin_sin \
    --u-mode profiled --profile-objective map --dtype refined \
    --freq-init spectral --profile-cg-iters 100 --lr-decay 0.1 \
    --nepoch 1500 --n-evals 75

# --- X: reference-protocol baseline streams ---------------------------
refrun() { timeout 3600 python -m gphm_tpu.cli --no-figures \
             --reference-protocol --out result_log_r3x "$@"; }
refrun --equation poisson_1d-single_sin --n-evals 400
refrun --equation poisson_1d-sin_cos --n-evals 400
refrun --equation advection-sin --n-evals 400
refrun --equation poisson_2d-sin_sin --n-evals 200
refrun --equation poisson_1d-x_time_sinx --n-evals 400
refrun --equation poisson_1d-mix_sin --n-evals 400
echo "campaign chain H done"
