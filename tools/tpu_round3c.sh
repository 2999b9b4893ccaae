#!/bin/bash
# Round-3 campaign T: TPU production runs, in value order.
#  T1: poisson_2d-x2y2_add_sinsin — the measured result for the separable
#      2D polynomial mean function (VERDICT r2 #8), vs a no-trend control.
#  T2: advection-sin MAP-profiled + rollback + cg200 (VERDICT r2 #3) —
#      the CPU probe reached 4.5e-4 at epoch ~600 on the N=96 reduction;
#      target <= 7.2e-4 (the adam 2e5-epoch number) inside 4k epochs.
#  T3: campaign S retry with --multi-start-batch 2 (8 starts at N_col=900
#      OOM as one vmapped batch: 28.3 GB vs 15.75 GB HBM).
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

run() { timeout 14400 python -m gphm_tpu.cli --no-figures "$@"; }

# T1: 2D mean function, shipped default (mean_poly 2) + no-trend control
run --out result_log_r3t --equation poisson_2d-x2y2_add_sinsin
run --out result_log_r3t_notrend --equation poisson_2d-x2y2_add_sinsin \
    --mean-poly -1

# T2: advection MAP-profiled (probe-validated recipe)
run --out result_log_r3adv --equation advection-sin --u-mode profiled \
    --profile-objective map --dtype refined --freq-init spectral \
    --profile-cg-iters 200 --jitter 1e-6 --nepoch 4000 --n-evals 40

# T3: campaign S retry, HBM-fitting multi-start groups
run --out result_log_r3ms --equation poisson_1d-mix_sin \
    --profile-objective marginal --multi-start 8 --multi-start-frac 0.05 \
    --multi-start-batch 2
run --out result_log_r3ms --equation poisson_1d-x_time_sinx \
    --multi-start 8 --multi-start-frac 0.05 --multi-start-batch 2
echo "campaign T done"
