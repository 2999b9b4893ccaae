#!/bin/bash
# Round-2 campaign, part N2 (follow-up): lr-decay leg for the mean-function
# headline case.  Campaign K measured cosine decay as a single-GP-only
# lever (single_sin 1.1e-4, x_time_sinx 1.3e-3 — both bests); with the
# parabola now carried by the trend, N1's single-GP marginal run is
# exactly that regime, and its fixed-lr tail oscillates (2.5e-3 @250 →
# 2.9e-3 @2.1k).  N3 = N1 + --lr-decay 0.05, targeting the 1e-4 band.
LOG=${1:-/tmp/round2n.log}
cd "$(dirname "$0")/.."

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

seg result_log_n3 --equation poisson_1d-x2_add_sinx --quiet \
    --u-mode profiled --dtype refined --freq-init spectral \
    --mean-poly 2 --lr-decay 0.05 --nepoch 20000 --n-evals 400

echo "CAMPAIGN-N2 DONE $(date +%H:%M:%S)" >> "$LOG"
