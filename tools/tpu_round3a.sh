#!/bin/bash
# Round-3 campaign R: reproduce every 1D headline number from the SHIPPED
# YAML defaults via the bare CLI (VERDICT r2 #2 "Done" criterion).
# Sequential on the single TPU chip; artifacts under result_log_r3.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"
OUT=result_log_r3

run() { timeout 14400 python -m gphm_tpu.cli --out "$OUT" --no-figures "$@"; }

run --equation poisson_1d-single_sin        # profiled marginal decay, 6k
run --equation poisson_1d-sin_cos           # profiled marginal decay, 6k
run --equation poisson_1d-x_time_sinx       # + spectral init, 1e4
run --equation poisson_1d-x2_add_sinx       # + spectral + mean-poly 2, 2e4
run --equation poisson_1d-mix_sin           # two-GP profiled MAP hedge, 3e4
echo "campaign R done"
