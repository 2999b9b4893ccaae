#!/bin/bash
# Round-4 master chain, v7 (recovery after the remote-compile wedge).
#
# At 10:17 the allencahn MAP-profiled leg's 6x-unrolled GN refined
# program went to the terminal-side compiler and the worker stopped
# answering ALL clients for >45 min (remote_compile serializes; a
# trivial matmul probe hangs). Lessons encoded here:
#   * `probe_wait` gates every leg: never launch into a wedged device,
#     and never let a leg burn its timeout against one.
#   * Cache-friendly cheap legs run FIRST (programs already compiled
#     this round: sin_cos/single_sin/x_time family, mix_sin adam
#     resume); the big NEW programs (sin_sin SLQ, allencahn GN) run
#     LAST so a repeat wedge cannot take the cheap wins with it.
#   * The allencahn leg keeps newton 6 / cg 100 (the program the
#     server may by now have cached) but is final and probe-gated.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

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

ref  420  --equation poisson_1d-sin_cos --n-evals 400
ours 900  --equation poisson_1d-sin_cos --n-evals 200
ours 900  --equation poisson_1d-single_sin --n-evals 200
ref  3600 --equation poisson_1d-mix_sin --n-evals 400 --resume
run 3600 --out result_log_r4y2 --equation poisson_2d-sin_sin \
    --u-mode profiled --dtype refined --freq-init spectral \
    --profile-cg-iters 100 --lr-decay 0.1 --occam-2d slq \
    --nepoch 1000 --n-evals 100
run 2700 --out result_log_r4z1 --equation poisson_1d-mix_sin \
    --profile-objective marginal --occam-schedule "0:0.3,1:0.7" \
    --n-evals 100
ours 2700 --equation poisson_2d-x2y2_add_sinsin --n-evals 150
run 3600 --out result_log_r4ac1 --equation allencahn_2d-mix-sincos \
    --u-mode profiled --profile-objective map --dtype refined \
    --freq-init spectral --profile-newton-iters 6 --profile-cg-iters 100 \
    --lr-decay 0.1 --nepoch 3000 --n-evals 150
echo "campaign chain r4k done"
