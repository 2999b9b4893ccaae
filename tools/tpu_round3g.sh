#!/bin/bash
# Round-3 campaign X: reference-protocol baseline streams with dense eval
# cadence, so tools/time_to_tolerance.py has a measured adam-trajectory
# crossing epoch (= the reference's crossing epoch; trajectory parity is
# pinned to ~1e-13) for every headline equation instead of a same-epoch
# lower bound.  Ordered by table value; each leg wall-capped.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

run() { timeout 3600 python -m gphm_tpu.cli --no-figures \
          --reference-protocol --out result_log_r3x "$@"; }

run --equation poisson_1d-single_sin --n-evals 400
run --equation poisson_1d-sin_cos --n-evals 400
run --equation advection-sin --n-evals 400
run --equation poisson_2d-sin_sin --n-evals 200
run --equation poisson_1d-x_time_sinx --n-evals 400
run --equation poisson_1d-mix_sin --n-evals 400
echo "campaign X done"
