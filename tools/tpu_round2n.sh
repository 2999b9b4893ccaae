#!/bin/bash
# Round-2 campaign, part N: polynomial mean functions on the headline gap.
#
# Why: trough-checkpoint FFT analysis (ops/meanfn.py docstring) shows the
# campaign-G/I x2_add_sinx plateau at ~5e-3 is the PARABOLA, not the
# spectral line — u = sin(500x) - 2(x-0.5)^2, and the parabola's source
# contribution (u_xx = -4) sits 1.6e-5 below the line's 2.5e5 amplitude,
# under the learned residual noise floor.  `--mean-poly 2` fits the trend
# jointly in closed form (universal kriging; profiled mode adds p=3
# columns to the same SPD system), so the GP only carries the line.
# Target: the reference band 1e-3..1e-4 (reference run_1d.sh:39-40).
#   N1: single-GP marginal + spectral + trend, N=400, no lr decay
#       (L1's decay leg plateaued at 0.145; K2 showed decay breaks x2)
#   N2: two-GP marginal + spectral + trend, cp=0.5 (I1 protocol + trend;
#       I1 without the trend: 8.1e-3)
LOG=${1:-/tmp/round2n.log}
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

seg result_log_n1 --equation poisson_1d-x2_add_sinx --quiet \
    --u-mode profiled --dtype refined --freq-init spectral \
    --mean-poly 2 --nepoch 20000 --n-evals 400

seg result_log_n2 --equation poisson_1d-x2_add_sinx --extra --quiet \
    --u-mode profiled --dtype refined --freq-init spectral \
    --mean-poly 2 --change-point 0.5 --nepoch 20000 --n-evals 400

echo "CAMPAIGN-N DONE $(date +%H:%M:%S)" >> "$LOG"
