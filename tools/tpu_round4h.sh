#!/bin/bash
# Round-4 master chain, v4 (supersedes r4g, which never started a leg).
#
# Reprioritized for the ~5h of round wall that remains (round-3 budget
# was 59.3k s of builder wall; round 4 is ~41.6k s in). Order:
#   1. x_time_sinx `ours` — the crossing-table row whose first attempt
#      starved under the static-length runner (now fixed, ecdbf0a);
#      also the live TPU validation of that fix on the worst case.
#   2. allencahn ref-protocol f32 — the last crossing-table row.
#   3. allencahn MAP-profiled attack (VERDICT #4) — budget collapse
#      attempt at 3000 epochs vs the reference's 3e6.
#   4. sin_sin profiled + SLQ-corrected Occam (VERDICT #2 follow-up) —
#      does the repaired evidence gradient fix the 2D marginal ascent?
#   5. mix_sin occam-schedule leg (VERDICT #5 direct attack) — evidence
#      tempering; note the shipped default just delivered 3.15e-4 with
#      zero rollbacks under the two-eval trigger, so this leg is now
#      confirmatory rather than required.
#   6. x2y2 shipped-default stream (regenerates the campaign-W artifact).
#   7. multi-start redeem attempt (VERDICT #6).
#
# $1 (optional): PID of the draining mix_sin leg to wait on.
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

ours 2700 --equation poisson_1d-x_time_sinx --n-evals 200
ref  2700 --equation allencahn_2d-mix-sincos --n-evals 300
run 3600 --out result_log_r4ac1 --equation allencahn_2d-mix-sincos \
    --u-mode profiled --profile-objective map --dtype refined \
    --freq-init spectral --profile-newton-iters 6 --profile-cg-iters 100 \
    --lr-decay 0.1 --nepoch 3000 --n-evals 150
run 3600 --out result_log_r4y2 --equation poisson_2d-sin_sin \
    --u-mode profiled --dtype refined --freq-init spectral \
    --profile-cg-iters 100 --lr-decay 0.1 --occam-2d slq \
    --nepoch 1000 --n-evals 100
run 2700 --out result_log_r4z1 --equation poisson_1d-mix_sin \
    --profile-objective marginal --occam-schedule "0:0.3,1:0.7" \
    --n-evals 100
ours 2700 --equation poisson_2d-x2y2_add_sinsin --n-evals 150
run 2700 --out result_log_r4ms --equation poisson_1d-x_time_sinx \
    --multi-start 8 --multi-start-frac 0.05 --multi-start-batch 2
echo "campaign chain r4h done"
