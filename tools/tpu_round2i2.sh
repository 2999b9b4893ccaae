#!/bin/bash
# Round-2 campaign, part I (trimmed rerun): whitened-latent + marginal
# profiled engine (commit ce4e3bf) on TPU.  The 2D linear segs of the
# original tpu_round2i.sh are dropped — campaign H (tpu_round2h.sh) runs
# the identical configs under the same (now-default) marginal engine.
# Remaining: 1D marginal headlines + NEW profiled Allen-Cahn (1D Gauss-
# Newton, 2D Kronecker-PCG Gauss-Newton).
LOG=${1:-/tmp/round2i2.log}
cd "$(dirname "$0")/.."

# queue behind a running campaign (pid as $2)
FPID=${2:-}
if [ -n "$FPID" ]; then
  while [ -e "/proc/$FPID" ]; do sleep 60; done
fi

tpu_wait() {
  for i in $(seq 1 45); do
    if timeout 90 python -c "import jax; jax.numpy.ones((8,8)).sum().block_until_ready()" \
        >/dev/null 2>&1; then return 0; fi
    sleep 60
  done
}

seg() {
  out=$1; shift
  for attempt in 1 2 3; do
    extra=""
    [ $attempt -gt 1 ] && extra="--resume"
    echo "=== [$out] $* (attempt $attempt $extra) $(date +%H:%M:%S)" >> "$LOG"
    res=$(timeout 10000 python -m gphm_tpu.cli --out "$out" --no-figures \
          "$@" $extra 2>&1 | grep -vE "WARNING|symbolize|RAW:|    @|0x7|cpu_aot|^E08" | tail -4)
    echo "$res" >> "$LOG"
    if echo "$res" | grep -q "err mean"; then return 0; fi
    echo "  attempt $attempt failed; waiting for TPU recovery" >> "$LOG"
    tpu_wait
  done
  echo "  GAVE UP on [$out] $*" >> "$LOG"
  return 1
}

# I1: x2_add_sinx headline — profiled base + profiled extra GP, spectral
# init, cp=0.5 (campaign-G analog got 4.9e-3 under MAP; paper band 1e-3..1e-4)
seg result_log_marg --equation poisson_1d-x2_add_sinx --extra --quiet \
    --u-mode profiled --dtype refined --freq-init spectral \
    --change-point 0.5 --nepoch 20000 --n-evals 150

# hedge: the marginal phase-1 trajectory on x2 plateaus far above the
# MAP-profiled engine's (1.39 vs 0.30 rel-L2 measured on CPU f64); run the
# proven MAP objective too so the headline is covered either way
seg result_log_marg_map --equation poisson_1d-x2_add_sinx --extra --quiet \
    --u-mode profiled --profile-objective map --dtype refined \
    --freq-init spectral --change-point 0.5 --nepoch 20000 --n-evals 150

# I2/I3: easy 1D configs (G analogs: 6.2e-6 / 6.8e-5 at 20k)
seg result_log_marg --equation poisson_1d-single_sin --quiet \
    --u-mode profiled --dtype refined --nepoch 6000 --n-evals 30
seg result_log_marg --equation poisson_1d-sin_cos --quiet \
    --u-mode profiled --dtype refined --nepoch 6000 --n-evals 30

# I4: mix_sin two-GP (G analog: 7.9e-5).  CPU f64 measurement: the
# marginal phase-1 plateaus ~5e-2 where the MAP engine reached 7.9e-5,
# so hedge with a MAP leg here too.
seg result_log_marg --equation poisson_1d-mix_sin --extra --quiet \
    --u-mode profiled --dtype refined --change-point 0.5 \
    --nepoch 20000 --n-evals 150
seg result_log_marg_map --equation poisson_1d-mix_sin --extra --quiet \
    --u-mode profiled --profile-objective map --dtype refined \
    --change-point 0.5 --nepoch 20000 --n-evals 150

# I5: x_time_sinx (G analog: 2.4e-3)
seg result_log_marg --equation poisson_1d-x_time_sinx --quiet \
    --u-mode profiled --dtype refined --nepoch 10000 --n-evals 50

# I6/I7: NEW — profiled Allen-Cahn 1D (damped Gauss-Newton conditional
# optimum; adam-protocol round-1 numbers: 5.9e-5 / 8.1e-5 at 1e5 epochs)
seg result_log_marg --equation allencahn_1d-single_sin --quiet \
    --u-mode profiled --dtype refined --nepoch 4000 --n-evals 40
seg result_log_marg --equation allencahn_1d-sin_cos --quiet \
    --u-mode profiled --dtype refined --nepoch 4000 --n-evals 40

# I12: NEW — profiled Allen-Cahn 2D (Gauss-Newton over the Kronecker PCG;
# adam round-2 full budget: 7.5e-3 at 2.7e6 epochs / 5660 s)
seg result_log_marg --equation allencahn_2d-mix-sincos --quiet \
    --u-mode profiled --dtype refined --jitter 1e-5 \
    --nepoch 1500 --n-evals 30

echo "CAMPAIGN-I2 DONE $(date +%H:%M:%S)" >> "$LOG"
