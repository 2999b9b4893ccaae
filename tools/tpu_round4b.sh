#!/bin/bash
# Round-4 campaign chain B, time-budgeted for the post-chain-A window.
#
#  Z (round-3 VERDICT #5): attack the mix_sin cliff dependency directly.
#    The shipped MAP default's best path NEEDS its own failure recovery
#    (fast descent -> impropriety cliff -> 3 rollbacks -> early stop at
#    4.39e-4; the pre-cliff MAP best is 3.3e-4). Evidence tempering
#    (--occam-schedule) runs the improper MAP-like objective early for
#    speed and brings the Occam term in before the cliff can fire:
#      Z1 = hard handoff to the full marginal at 30% of budget;
#      Z3 = handoff to a 0.3-weight hedge (the marginal two-GP measured
#           2.8e-2 on mix_sin — full-weight evidence walks off the weak
#           lines, campaign I2 finding 1 — so a partial weight may bound
#           the cliff without the walk-away).
#  Y2 (round-3 VERDICT #1/#2): the SLQ-corrected marginal on the 2D grid
#    family. Campaign Y measured the separable surrogate's Occam gradient
#    badly biased at sharp hyperparameters (freq cosines negative); if
#    that bias is what makes the production marginal ascent lose the
#    hyperparameters (sin_sin plateau 0.175), the corrected evidence
#    should descend past it. Dense eval cadence: the verdict survives a
#    timeout via metrics_fold0.jsonl.
#  AC (round-3 VERDICT #4): the last budget holdout (allencahn_2d
#    7.5e-3 @ 3e6 adam epochs / 5,660 s). The GN-profiled probe stalled
#    at 0.43 @ 1.5k; retry with the campaign-T advection recipe (MAP +
#    spectral + decay + rollback armed) and more GN/CG effort, then the
#    marginal+tempering variant if the window allows.
#  V-retry (round-3 VERDICT #6): regenerate the multi-start negative
#    result's on-disk artifacts (the r3 streams were wiped in rotation).
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

run() { timeout "$1" python -m gphm_tpu.cli --no-figures "${@:2}"; }

# --- Z: mix_sin evidence tempering ------------------------------------
run 5400 --out result_log_r4z1 --equation poisson_1d-mix_sin \
    --profile-objective marginal --occam-schedule "0:0.3,1:0.7" \
    --n-evals 100
run 5400 --out result_log_r4z3 --equation poisson_1d-mix_sin \
    --profile-objective marginal --occam-schedule "0:0.3,0.3:0.7" \
    --n-evals 100

# --- Y2: SLQ-corrected marginal on the 2D grid family ------------------
run 7200 --out result_log_r4y2 --equation poisson_2d-sin_sin \
    --u-mode profiled --dtype refined --freq-init spectral \
    --profile-cg-iters 100 --lr-decay 0.1 --occam-2d slq \
    --nepoch 1000 --n-evals 100

# --- AC: allencahn_2d profiled attack ----------------------------------
run 7200 --out result_log_r4ac1 --equation allencahn_2d-mix-sincos \
    --u-mode profiled --profile-objective map --dtype refined \
    --freq-init spectral --profile-newton-iters 6 --profile-cg-iters 100 \
    --lr-decay 0.1 --nepoch 3000 --n-evals 150
run 7200 --out result_log_r4ac2 --equation allencahn_2d-mix-sincos \
    --u-mode profiled --profile-objective marginal --dtype refined \
    --freq-init spectral --profile-newton-iters 6 --profile-cg-iters 100 \
    --lr-decay 0.1 --occam-schedule "0:0.3,1:0.7" \
    --nepoch 3000 --n-evals 150

# --- V-retry: multi-start artifacts ------------------------------------
run 5400 --out result_log_r4ms --equation poisson_1d-x_time_sinx \
    --multi-start 8 --multi-start-frac 0.05 --multi-start-batch 2
echo "campaign chain r4b done"
