#!/bin/bash
# Round-2 campaign, part O: a clean full-budget allencahn_2d run.
#
# Why: the PARITY number of record (7.5e-3 @2.7M) comes from a round-1 run
# resumed across the round-2 numerics change (highest-precision matmuls +
# exact-phase trig shifted the f32 loss surface mid-run; honesty notes in
# PARITY).  This is the reference's largest budget (3e6 epochs,
# reference run_2d.sh:27) executed end-to-end under one set of numerics:
# adam protocol, f32, jitter 1e-5 (the f32-stability level measured in
# round 1; the reference's 1e-6 NaNs at ~500k).  ~2.5 h at the measured
# 2.4 ms/epoch.
LOG=${1:-/tmp/round2o.log}
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
  for attempt in 1 2 3 4 5; do
    extra=""
    [ $attempt -gt 1 ] && extra="--resume"
    echo "=== [$out] $* (attempt $attempt $extra) $(date +%H:%M:%S)" >> "$LOG"
    res=$(timeout 13000 python -m gphm_tpu.cli --out "$out" --no-figures \
          "$@" $extra 2>&1 | grep -vE "WARNING|symbolize|RAW:|    @|0x7|cpu_aot|^E08" | tail -4)
    echo "$res" >> "$LOG"
    if echo "$res" | grep -q "err mean"; then return 0; fi
    echo "  attempt $attempt failed; waiting for TPU recovery" >> "$LOG"
    tpu_wait
  done
  echo "  GAVE UP on [$out] $*" >> "$LOG"
  return 1
}

seg result_log_o --equation allencahn_2d-mix-sincos --quiet \
    --jitter 1e-5 --nepoch 3000000 --n-evals 60

echo "CAMPAIGN-O DONE $(date +%H:%M:%S)" >> "$LOG"
