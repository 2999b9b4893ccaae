#!/bin/bash
# Round-2 campaign, part M: x2_add_sinx at N_col=900 under the profiled
# marginal engine — the last-gap experiment.
#
# Why: the reference band for this hardest case is 1e-3..1e-4
# (reference run_1d.sh:39-40).  Round-2 best is 4.9e-3 (campaign-G MAP)
# / 8.1e-3 (marginal, TPU) / 5.0e-3 (marginal, CPU f64) — all at the
# shipped N_col=400, which samples sin(500x) at 5 points/cycle and is
# resolution-limited (PARITY round-1 note: adam at N_col=900 reached
# 1.7e-2 at 3e5 epochs and was still descending, 20x better than the
# N=400 adam plateau).  The marginal profiled engine at N=900 removes
# the resolution cap while keeping the collapsed epoch budget; the
# campaign-K6 x_time_sinx run measures the same engine at N=900 at
# ~0.4 s/epoch on TPU, so 12k epochs ~= 80 min.
#   M1: two-GP marginal + spectral init, change_point 0.5, no lr decay
#       (K2 showed cosine decay breaks the two-GP x2 descent: 0.30 vs
#       8.1e-3 without).
LOG=${1:-/tmp/round2m.log}
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

seg result_log_m --equation poisson_1d-x2_add_sinx --extra --quiet \
    --u-mode profiled --dtype refined --freq-init spectral \
    --change-point 0.5 --N-col 900 --nepoch 12000 --n-evals 240

echo "CAMPAIGN-M DONE $(date +%H:%M:%S)" >> "$LOG"
