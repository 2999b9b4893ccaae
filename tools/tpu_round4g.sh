#!/bin/bash
# Round-4 master chain, v3 (supersedes the r4f remainder).
#
# Context: r4f's x_time_sinx `ours` leg starved at dense eval cadence —
# the static-length chunk runner recompiled the refined profiled body for
# every distinct launch length (minutes per compile), so the leg produced
# ONE eval in 1500 s. models/base.py now takes the launch length as a
# traced operand (one compile per phase); the r4f mix_sin `ours` leg
# launched after the fix and evaluates densely (It 150 by ~3 min). This
# chain re-runs the x_time leg under the fix, then continues exactly
# where r4f would have gone (phase-2 VERDICT #5/#4 legs, phase-3 extras).
#
# $1 (optional): PID of the still-draining r4f leg to wait on before
# touching the chip.
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

# --- Phase 1 completion: the two crossing-table rows r4f missed --------
ours 2700 --equation poisson_1d-x_time_sinx --n-evals 200
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
echo "campaign chain r4g done"
