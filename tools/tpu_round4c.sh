#!/bin/bash
# Round-4 campaign R-redo: regenerate the our-engine shipped-default
# streams (the round-3 result_log_* rotation wiped them) at dense eval
# cadence, so tools/time_to_tolerance.py can put MEASURED our-engine
# crossings next to the measured reference-protocol crossings of
# result_log_r4x in the PARITY table (round-3 VERDICT #3).
#
# Every leg is the bare shipped config (the campaign-proven engine
# defaults pinned by tests/test_config_defaults.py) — no overrides
# beyond eval cadence and output dir.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

run() { timeout "$1" python -m gphm_tpu.cli --no-figures \
          --out result_log_r4r "${@:2}"; }

run 1800 --equation poisson_1d-single_sin --n-evals 200
run 1800 --equation poisson_1d-sin_cos --n-evals 200
run 2700 --equation poisson_1d-x_time_sinx --n-evals 200
run 4500 --equation poisson_1d-mix_sin --n-evals 200
run 4500 --equation advection-sin --n-evals 200
run 1800 --equation poisson_2d-sin_sin --n-evals 200
run 4500 --equation allencahn_2d-mix-sincos --n-evals 200
echo "campaign chain r4c done"
