#!/bin/bash
# Round-4 follow-on chain: the table rows r4d doesn't cover, priority
# order. Launch after (or instead of) r4d phase 2 depending on the
# remaining round wall.
#
#   1. x2_add_sinx pair — the remaining headline hard-1D row (reference
#      budget 1e6 + two-GP; ours = refined two-GP + mean_poly, 20k).
#      The ours cap truncates ~12k/20k: the 1e-2/1e-3 crossings land in
#      the first quarter of the run (campaign R: 5.5e-4 @9k).
#   2. x2y2 bare shipped default — regenerates the campaign-W stream the
#      rotation wiped (the MAP-profiled default shipped on its evidence)
#      and validates the new default end-to-end from the bare CLI.
#   3. 2D sin_cos + sin_add_cos pairs, allencahn_1d pairs — the rest of
#      the config matrix at dense cadence.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

ref() { timeout "$1" python -m gphm_tpu.cli --no-figures \
          --reference-protocol --out result_log_r4x "${@:2}"; }
ours() { timeout "$1" python -m gphm_tpu.cli --no-figures \
          --out result_log_r4r "${@:2}"; }

ref  3600 --equation poisson_1d-x2_add_sinx --n-evals 400
ours 3600 --equation poisson_1d-x2_add_sinx --n-evals 200
ours 3600 --equation poisson_2d-x2y2_add_sinsin --n-evals 150
ref  1800 --equation poisson_2d-sin_cos --n-evals 200
ours 1800 --equation poisson_2d-sin_cos --n-evals 200
ref  4500 --equation poisson_2d-sin_add_cos --n-evals 300
ours 2700 --equation poisson_2d-sin_add_cos --n-evals 200
ref  1200 --equation allencahn_1d-single_sin --n-evals 400
ours 1200 --equation allencahn_1d-single_sin --n-evals 200
ref  1200 --equation allencahn_1d-sin_cos --n-evals 400
ours 1200 --equation allencahn_1d-sin_cos --n-evals 200
echo "campaign chain r4e done"
