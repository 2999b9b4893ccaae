#!/bin/bash
# Round-2 campaign, part H: profiled-latent 2D on TPU — the shipped 2D
# linear configs (Poisson sin_add_cos / sin_sin / sin_cos, advection)
# via u_mode=profiled at the refined tier.  Short budgets: profiled mode
# needs ~1e3 hyperparameter steps, not the reference's 1e5-1e6.
LOG=${1:-/tmp/round2h.log}
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
          "$@" $extra 2>&1 | grep -vE "WARNING|symbolize|RAW:|    @|0x7" | tail -4)
    echo "$res" >> "$LOG"
    if echo "$res" | grep -q "err mean"; then return 0; fi
    echo "  attempt $attempt failed; waiting for TPU recovery" >> "$LOG"
    tpu_wait
  done
  echo "  GAVE UP on [$out] $*" >> "$LOG"
  return 1
}

# H1: sin_add_cos (N=200; reference budget 1e6, round-1 adam 9.8e-4 @ 732s)
seg result_log_prof2d --equation poisson_2d-sin_add_cos --quiet \
    --u-mode profiled --dtype refined --nepoch 3000 --n-evals 30

# H2: advection beta=200 (N=200; round-1 adam 7.2e-04 @ 215s)
seg result_log_prof2d --equation advection-sin --quiet \
    --u-mode profiled --dtype refined --nepoch 3000 --n-evals 30

# H3: sin_sin (N=400 flagship; round-1 adam 1.5e-03 @ 343s)
seg result_log_prof2d --equation poisson_2d-sin_sin --quiet \
    --u-mode profiled --dtype refined --nepoch 3000 --n-evals 30

# H4/H5 (sin_cos bonus config; sin_sin spectral variant) dropped:
# the 2D profiled step measures ~1 s/epoch at this scale, and the
# remaining TPU budget this round goes to campaigns K (marginal
# spectral-init legs) and J (allencahn 3e6 rollback validation) instead.

echo "CAMPAIGN-H DONE $(date +%H:%M:%S)" >> "$LOG"
