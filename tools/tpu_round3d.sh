#!/bin/bash
# Round-3 campaign U (retry): x2y2 profiled-trend headline + the two
# multi-start legs with HBM-fitting groups (campaign S OOM post-mortem).
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

run() { timeout 10800 python -m gphm_tpu.cli --no-figures "$@"; }

run --out result_log_r3t2 --equation poisson_2d-x2y2_add_sinsin
run --out result_log_r3ms --equation poisson_1d-x_time_sinx \
    --multi-start 8 --multi-start-frac 0.05 --multi-start-batch 2
run --out result_log_r3ms --equation poisson_1d-mix_sin \
    --profile-objective marginal --multi-start 8 --multi-start-frac 0.05 \
    --multi-start-batch 2
echo "campaign U done"
