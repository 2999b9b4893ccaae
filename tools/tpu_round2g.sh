#!/bin/bash
# Round-2 campaign, part G: profiled-latent mode on TPU (short,
# high-value runs first), the dangling x_time_sinx spectral number, the
# full 3e6 allencahn budget under round-2 numerics, final bench.
LOG=${1:-/tmp/round2g.log}
cd "$(dirname "$0")/.."

# queue behind campaign F (pid passed as $2, default: wait for any
# running round2f.sh driver to exit)
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
          "$@" $extra 2>&1 | grep -vE "WARNING|symbolize|RAW:|    @|0x7" | tail -4)
    echo "$res" >> "$LOG"
    if echo "$res" | grep -q "err mean"; then return 0; fi
    echo "  attempt $attempt failed; waiting for TPU recovery" >> "$LOG"
    tpu_wait
  done
  echo "  GAVE UP on [$out] $*" >> "$LOG"
  return 1
}

# G1: profiled-mode headline — reference smoke config, full 1e5 budget in
# 2e4 profiled-refined epochs (the mode needs ~100x fewer steps)
seg result_log_prof --equation poisson_1d-single_sin --quiet \
    --u-mode profiled --dtype refined --nepoch 20000

# G2: second easy config
seg result_log_prof --equation poisson_1d-sin_cos --quiet \
    --u-mode profiled --dtype refined --nepoch 20000

# G3: x2_add_sinx — profiled base + profiled extra GP, spectral init,
# shipped N=400, change_point 0.5 (base needs its plateau before freeze)
seg result_log_prof --equation poisson_1d-x2_add_sinx --extra --quiet \
    --u-mode profiled --dtype refined --freq-init spectral \
    --change-point 0.5 --nepoch 30000 --n-evals 150

# G4: same at N_col=900 (the density the reference uses for hard cases)
seg result_log_prof2 --equation poisson_1d-x2_add_sinx --extra --quiet \
    --u-mode profiled --dtype refined --freq-init spectral \
    --change-point 0.5 --N-col 900 --nepoch 30000 --n-evals 150

# G5: mix_sin — reference's 1e-3..1e-4 flagship hard case, profiled two-GP
seg result_log_prof --equation poisson_1d-mix_sin --extra --quiet \
    --u-mode profiled --dtype refined --change-point 0.5 \
    --nepoch 30000 --n-evals 150

# G6: x_time_sinx spectral full-budget (PARITY's dangling claim) —
# deterministic pipeline, shipped protocol + spectral init
seg result_log_spec2 --equation poisson_1d-x_time_sinx --quiet \
    --freq-init spectral --refine-logdet-iters 0 \
    --dtype-schedule "float32:0.95,refined:0.05"

# G7: x_time_sinx profiled (short-budget alternative)
seg result_log_prof2 --equation poisson_1d-x_time_sinx --quiet \
    --u-mode profiled --dtype refined --nepoch 20000

# G8: allencahn_2d FULL 3e6 budget fresh under round-2 numerics
# (VERDICT #3; ~2.1 h at 2.4 ms/epoch)
seg result_log_ac3m --equation allencahn_2d-mix-sincos --quiet \
    --dtype float32 --jitter 1e-5 --nepoch 3000000

# G9: final bench
echo "=== bench.py final $(date +%H:%M:%S)" >> "$LOG"
timeout 2000 python bench.py >> "$LOG" 2>&1

echo "CAMPAIGN-G DONE $(date +%H:%M:%S)" >> "$LOG"
