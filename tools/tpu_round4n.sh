#!/bin/bash
# Round-4 chain v10: remaining legs after the allencahn attack, with
# per-leg archiving (the rotation lesson: a chain that archives only at
# the end archives nothing if the round wall lands mid-chain).
#   1. mix_sin occam-schedule (VERDICT #5 zero-rollback attack).
#   2. sin_sin SLQ-corrected evidence at N=400 (VERDICT #2 follow-up).
#   3. x2y2 shipped-default regen — campaign W's streams were lost in
#      rotation; this recreates a durable artifact for the new default.
#   4-5. sin_cos/single_sin shipped-default quick rows.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

probe_wait() {
  until timeout 90 python tools/tpu_probe.py; do
    echo "device wedged; waiting 120s"
    sleep 120
  done
}

arc() { python tools/archive_streams.py result_log_r4z1 result_log_r4y2 \
          result_log_r4r result_log_r4ac1 2>/dev/null; }
ours() { probe_wait; timeout "$1" python -m gphm_tpu.cli --no-figures \
          --out result_log_r4r "${@:2}"; arc; }
run() { probe_wait; timeout "$1" python -m gphm_tpu.cli --no-figures "${@:2}"; arc; }

run 2400 --out result_log_r4z1 --equation poisson_1d-mix_sin \
    --profile-objective marginal --occam-schedule "0:0.3,1:0.7" \
    --n-evals 100
run 2400 --out result_log_r4y2 --equation poisson_2d-sin_sin \
    --u-mode profiled --dtype refined --freq-init spectral \
    --profile-cg-iters 100 --lr-decay 0.1 --occam-2d slq \
    --nepoch 1000 --n-evals 100
ours 2400 --equation poisson_2d-x2y2_add_sinsin --n-evals 150
ours 900  --equation poisson_1d-sin_cos --n-evals 200
ours 900  --equation poisson_1d-single_sin --n-evals 200
echo "campaign chain r4n done"
