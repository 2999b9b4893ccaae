#!/bin/bash
# Round-3 campaign V: the two multi-start legs (r2 VERDICT next #4),
# retried after the campaign-U session died before they started.
# HBM-fitting groups per the campaign-S OOM post-mortem.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

run() { timeout 14400 python -m gphm_tpu.cli --no-figures "$@"; }

run --out result_log_r3ms --equation poisson_1d-mix_sin \
    --profile-objective marginal --multi-start 8 --multi-start-frac 0.05 \
    --multi-start-batch 2
run --out result_log_r3ms --equation poisson_1d-x_time_sinx \
    --multi-start 8 --multi-start-frac 0.05 --multi-start-batch 2
echo "campaign V done"
