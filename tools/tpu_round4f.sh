#!/bin/bash
# Round-4 master chain, v2 (supersedes r4d — whose caps overran the round
# wall and would have starved the phase-2 VERDICT legs; r4d's completed
# leg 1, the full-budget reference-protocol single_sin stream, stands in
# result_log_r4x).
#
# Phase 1 — the measured crossing table (r3 VERDICT #3). Caps are sized
# for the CROSSINGS (t<1e-2 / t<1e-3), not run completion: a truncated
# stream keeps every crossing it reached (metrics_fold0.jsonl streams as
# the run goes) and time_to_tolerance records caps honestly as lower
# bounds. Notes per equation:
#   * sin_sin: the shipped default IS the adam protocol (YAML), so ONE
#     reference-protocol stream serves both table columns.
#   * allencahn ref leg: at the reference jitter 1e-6, f32 is known to
#     NaN near ep 500k (YAML note) — the leg's value is the measured
#     lower bound + the divergence observation, so the cap is tight.
#   * mix_sin/x_time ref legs at N=900/600 adam 1e6 are capped at the
#     crossing region, not the full budget.
#
# Phase 2 — the VERDICT #5/#4 experimental legs plus the x2y2
# shipped-default stream (regenerates the campaign-W artifact the
# rotation wiped), then lower-priority extras that run if the wall
# allows; the chain is expected to be killed at round end wherever it
# stands.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

ref() { timeout "$1" python -m gphm_tpu.cli --no-figures \
          --reference-protocol --out result_log_r4x "${@:2}"; }
ours() { timeout "$1" python -m gphm_tpu.cli --no-figures \
          --out result_log_r4r "${@:2}"; }
run() { timeout "$1" python -m gphm_tpu.cli --no-figures "${@:2}"; }

# --- Phase 1: crossing-table pairs -------------------------------------
ours 900  --equation poisson_1d-single_sin --n-evals 200
ref  1200 --equation poisson_1d-sin_cos --n-evals 400
ours 1200 --equation poisson_1d-sin_cos --n-evals 200
ref  1800 --equation poisson_2d-sin_sin --n-evals 300
ours 1200 --equation advection-sin --n-evals 200
ref  2400 --equation advection-sin --n-evals 400
ref  1500 --equation poisson_1d-x_time_sinx --n-evals 400
ours 1500 --equation poisson_1d-x_time_sinx --n-evals 200
ref  1500 --equation poisson_1d-mix_sin --n-evals 400
ours 2400 --equation poisson_1d-mix_sin --n-evals 200
ref  2700 --equation allencahn_2d-mix-sincos --n-evals 300

# --- Phase 2: VERDICT #5 / #4 legs + W-artifact regeneration -----------
run 2700 --out result_log_r4z1 --equation poisson_1d-mix_sin \
    --profile-objective marginal --occam-schedule "0:0.3,1:0.7" \
    --n-evals 100
run 3600 --out result_log_r4ac1 --equation allencahn_2d-mix-sincos \
    --u-mode profiled --profile-objective map --dtype refined \
    --freq-init spectral --profile-newton-iters 6 --profile-cg-iters 100 \
    --lr-decay 0.1 --nepoch 3000 --n-evals 150
ours 2700 --equation poisson_2d-x2y2_add_sinsin --n-evals 150
run 3600 --out result_log_r4y2 --equation poisson_2d-sin_sin \
    --u-mode profiled --dtype refined --freq-init spectral \
    --profile-cg-iters 100 --lr-decay 0.1 --occam-2d slq \
    --nepoch 1000 --n-evals 100

# --- Phase 3: extras, wall permitting -----------------------------------
run 2700 --out result_log_r4z3 --equation poisson_1d-mix_sin \
    --profile-objective marginal --occam-schedule "0:0.3,0.3:0.7" \
    --n-evals 100
ref  1800 --equation poisson_1d-x2_add_sinx --n-evals 400
ours 2400 --equation poisson_1d-x2_add_sinx --n-evals 200
run 3600 --out result_log_r4ac2 --equation allencahn_2d-mix-sincos \
    --u-mode profiled --profile-objective marginal --dtype refined \
    --freq-init spectral --profile-newton-iters 6 --profile-cg-iters 100 \
    --lr-decay 0.1 --occam-schedule "0:0.3,1:0.7" \
    --nepoch 3000 --n-evals 150
run 2700 --out result_log_r4ms --equation poisson_1d-x_time_sinx \
    --multi-start 8 --multi-start-frac 0.05 --multi-start-batch 2
bash tools/tpu_round4e.sh
echo "campaign chain r4f done"
