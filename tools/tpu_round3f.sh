#!/bin/bash
# Round-3 campaign W: MAP-profiled probes on the 2D Poisson family.
# The MAP hedge (+ rollback) is what broke the advection barrier
# (campaign T/U); the marginal objective is the measured limiter on
# poisson_2d at production size (campaign U: x2y2 plateaus at ~0.08,
# sin_sin at 0.175).  Probe whether MAP-profiled moves either.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

run() { timeout 10800 python -m gphm_tpu.cli --no-figures "$@"; }

# W1: x2y2 with the MAP objective, same shipped engine otherwise.
run --out result_log_r3w --equation poisson_2d-x2y2_add_sinsin \
    --profile-objective map --nepoch 1500 --n-evals 75

# W2: sin_sin MAP-profiled (the family's core case; marginal got 0.175).
run --out result_log_r3w --equation poisson_2d-sin_sin \
    --u-mode profiled --profile-objective map --dtype refined \
    --freq-init spectral --profile-cg-iters 100 --lr-decay 0.1 \
    --nepoch 1500 --n-evals 75
echo "campaign W done"
