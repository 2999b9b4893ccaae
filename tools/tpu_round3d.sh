#!/bin/bash
# Round-3 campaign U (continued): the 2D profiled-trend headline run and
# the multi-start leg that survives the remaining wall budget.
#  U2: poisson_2d-x2y2_add_sinsin under its new shipped default (profiled
#      marginal + spectral + joint trend solve + decay, refined tier).
#  U3: x_time_sinx multi-start retry with HBM-fitting groups (campaign S
#      OOM post-mortem; --multi-start-batch 2).
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

run() { timeout 10800 python -m gphm_tpu.cli --no-figures "$@"; }

run --out result_log_r3t2 --equation poisson_2d-x2y2_add_sinsin
run --out result_log_r3ms --equation poisson_1d-x_time_sinx \
    --multi-start 8 --multi-start-frac 0.05 --multi-start-batch 2
echo "campaign U done"
