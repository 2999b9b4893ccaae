#!/bin/bash
# Round-5 chain, stage B (r4 VERDICT #5a, #5c, #8, #9).
#
#   1. mix_sin reference-protocol stream, continuation leg (--resume):
#      stage A's leg 1 runs the first ~0.5e6 epochs; this drives the
#      stream toward the 1e6-epoch budget or its 1e-2 crossing.
#   2. allencahn_2d shipped-default stream (VERDICT #5c): measures the
#      shipped-default crossing column directly (adam f32, jitter 1e-5,
#      1e6-epoch budget) instead of inferring it from the r4x
#      reference-protocol stream.
#   3. x_time_sinx shipped-default regen under final_params=best
#      (VERDICT #8): the run now ENDS at its argmin snapshot; the
#      stream + stored params_fold0 demonstrate the containment on a
#      real artifact.
#   4-5. sin_cos / single_sin shipped-default reruns on the WARM compile
#      cache (VERDICT #9): the r4 crossing walls were compile-dominated
#      (~300-500 s); the persistent .jax_cache is a real product surface
#      (every production rerun after the first pays warm walls), so the
#      table records both cold (r4) and warm (these) columns honestly.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

probe_wait() {
  until timeout 900 python tools/tpu_probe.py; do
    echo "device wedged; quiet-waiting 600s"
    sleep 600
  done
}

arc() { python tools/archive_streams.py result_log_r5x result_log_r5z \
          result_log_r5r result_log_r5q 2>/dev/null; }
ref() { probe_wait; timeout "$1" python -m gphm_tpu.cli --no-figures \
          --reference-protocol --out result_log_r5x "${@:2}"; arc; }
ours() { probe_wait; timeout "$1" python -m gphm_tpu.cli --no-figures \
          --out result_log_r5r "${@:2}"; arc; }

# (stage-A outcome: the occam-ramp leg hit the cliff anyway — NaN at
# ep7200 at ramp weight ~0.8, one rollback, min 6.74e-4 vs the shipped
# default's 3.15e-4. The continuation leg is dropped; the ramp is a
# measured negative, PARITY campaign Z2.)
run() { probe_wait; timeout "$1" python -m gphm_tpu.cli --no-figures "${@:2}"; arc; }
# VERDICT #4 lever 2: staged mixture growth on the shipped mix_sin
# engine — 8 strongest pre-placed components from ep0, the rest
# activating over the first 40% of the budget; the cliff window
# (~ep7.2-9k) falls mid-activation where the mixture is still small
run 3600 --out result_log_r5q --equation poisson_1d-mix_sin \
    --staged-q 8:0.4 --freq-init spectral --n-evals 100
ref 3600 --equation poisson_1d-mix_sin --n-evals 400 --resume
# the faithful x2_add_sinx reference protocol is the TWO-GP trick
# (reference run_1d.sh pairs this equation with model_GP_solver_1d_extra,
# change_point 0.01); stage A's single-GP ref stream remains a valid
# adam baseline (measured: stalls ~5e-2 at 1e6 epochs, which is WHY the
# reference needs the trick)
ref 3600 --extra --equation poisson_1d-x2_add_sinx --n-evals 400
ours 4200 --equation allencahn_2d-mix-sincos --n-evals 300
ours 2400 --equation poisson_1d-x_time_sinx --n-evals 200
ours 1200 --equation poisson_1d-sin_cos --n-evals 200
ours 1200 --equation poisson_1d-single_sin --n-evals 200
ref 3600 --equation poisson_1d-mix_sin --n-evals 400 --resume
echo "campaign chain r5b done"
