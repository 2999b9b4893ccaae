#!/bin/bash
# Round-4 master chain, v8 (post-wedge reprioritization; supersedes r4k
# after its first quick leg).
#
# The 95-minute wedge consumed the window that would have run the two
# big VERDICT legs; with ~2.5 h of round wall left the order now puts
# irreplaceable TPU measurements first:
#   1-2. remaining quick rows (cheap, cached programs).
#   3. allencahn MAP-profiled attack (VERDICT #4) — no CPU substitute;
#      now compiles the SCANNED GN program (iteration-count-independent
#      size), so the wedge culprit is structurally gone.
#   4. mix_sin reference-stream resume — converts the crossing-table
#      bound into a measured crossing; completes VERDICT missing #1.
#   5. mix_sin occam-schedule (VERDICT #5 zero-rollback attack).
#   6. sin_sin SLQ leg (the CPU three-way A/B already answers its
#      question at N=48; TPU N=400 run only if wall remains).
#   7. x2y2 shipped-default artifact regen.
#
# $1: PID of the draining sin_cos ref leg.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi

probe_wait() {
  until timeout 90 python tools/tpu_probe.py; do
    echo "device wedged; waiting 120s"
    sleep 120
  done
}

ref() { probe_wait; timeout "$1" python -m gphm_tpu.cli --no-figures \
          --reference-protocol --out result_log_r4x "${@:2}"; }
ours() { probe_wait; timeout "$1" python -m gphm_tpu.cli --no-figures \
          --out result_log_r4r "${@:2}"; }
run() { probe_wait; timeout "$1" python -m gphm_tpu.cli --no-figures "${@:2}"; }

ours 900  --equation poisson_1d-sin_cos --n-evals 200
ours 900  --equation poisson_1d-single_sin --n-evals 200
run 3600 --out result_log_r4ac1 --equation allencahn_2d-mix-sincos \
    --u-mode profiled --profile-objective map --dtype refined \
    --freq-init spectral --profile-newton-iters 6 --profile-cg-iters 100 \
    --lr-decay 0.1 --nepoch 3000 --n-evals 150
ref  3600 --equation poisson_1d-mix_sin --n-evals 400 --resume
run 2700 --out result_log_r4z1 --equation poisson_1d-mix_sin \
    --profile-objective marginal --occam-schedule "0:0.3,1:0.7" \
    --n-evals 100
run 3600 --out result_log_r4y2 --equation poisson_2d-sin_sin \
    --u-mode profiled --dtype refined --freq-init spectral \
    --profile-cg-iters 100 --lr-decay 0.1 --occam-2d slq \
    --nepoch 1000 --n-evals 100
ours 2700 --equation poisson_2d-x2y2_add_sinsin --n-evals 150
echo "campaign chain r4l done"
