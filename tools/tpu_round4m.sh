#!/bin/bash
# Round-4 master chain, v9 (post-reboot restart of v8).
#
# The machine rotated before v8 (`tpu_round4l.sh`) ever launched; the
# result_log_r4* working dirs were wiped (only artifacts/ sidecars
# survive), which kills the mix_sin reference-stream resume leg — the
# checkpoint npz was never archived, only its JSON meta. That leg is
# dropped and documented in PARITY (the crossing row already carries an
# honest `>` bound from 222,500 observed epochs).
#
# Order = irreplaceable VERDICT legs first, quick reruns last:
#   1. allencahn MAP-profiled attack (VERDICT #4) — scanned GN program,
#      iteration-count-independent size (the wedge culprit is gone).
#   2. mix_sin occam-schedule (VERDICT #5 zero-rollback attack).
#   3. sin_sin SLQ-Occam at N=400 (VERDICT #2 follow-up; the CPU
#      three-way A/B answered the small-N question).
#   4. x2y2 shipped-default artifact regen.
#   5-6. sin_cos/single_sin shipped-default quick rows (cached engines,
#      fix the compile-dominated crossing-table walls).
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

probe_wait() {
  until timeout 90 python tools/tpu_probe.py; do
    echo "device wedged; waiting 120s"
    sleep 120
  done
}

ours() { probe_wait; timeout "$1" python -m gphm_tpu.cli --no-figures \
          --out result_log_r4r "${@:2}"; }
run() { probe_wait; timeout "$1" python -m gphm_tpu.cli --no-figures "${@:2}"; }

run 3600 --out result_log_r4ac1 --equation allencahn_2d-mix-sincos \
    --u-mode profiled --profile-objective map --dtype refined \
    --freq-init spectral --profile-newton-iters 6 --profile-cg-iters 100 \
    --lr-decay 0.1 --nepoch 3000 --n-evals 150
run 2400 --out result_log_r4z1 --equation poisson_1d-mix_sin \
    --profile-objective marginal --occam-schedule "0:0.3,1:0.7" \
    --n-evals 100
run 2400 --out result_log_r4y2 --equation poisson_2d-sin_sin \
    --u-mode profiled --dtype refined --freq-init spectral \
    --profile-cg-iters 100 --lr-decay 0.1 --occam-2d slq \
    --nepoch 1000 --n-evals 100
ours 1800 --equation poisson_2d-x2y2_add_sinsin --n-evals 150
ours 900  --equation poisson_1d-sin_cos --n-evals 200
ours 900  --equation poisson_1d-single_sin --n-evals 200
python tools/archive_streams.py result_log_r4ac1 result_log_r4z1 \
    result_log_r4y2 result_log_r4r
echo "campaign chain r4m done"
