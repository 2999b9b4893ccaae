#!/bin/bash
# Round-2 campaign, part J: the allencahn_2d 3e6-epoch reference protocol
# (f32, jitter 1e-5) rerun entirely under round-2 numerics, in a fresh
# directory with the NaN-rollback recovery active (the default
# nan_policy).  The first such rerun (campaign G2, result_log_ac3m)
# diverged to NaN near epoch 900k BEFORE the rollback subsystem landed
# (commit 094455a) and its rolling checkpoint was poisoned; this rerun is
# both the completion of that budget and a live validation of the
# failure-recovery path on a real mid-training divergence.
LOG=${1:-/tmp/round2j.log}
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
  for attempt in 1 2 3 4; do
    extra=""
    [ $attempt -gt 1 ] && extra="--resume"
    echo "=== [$out] $* (attempt $attempt $extra) $(date +%H:%M:%S)" >> "$LOG"
    res=$(timeout 12000 python -m gphm_tpu.cli --out "$out" --no-figures \
          "$@" $extra 2>&1 | grep -vE "WARNING|symbolize|RAW:|    @|0x7|cpu_aot|^E08" | tail -6)
    echo "$res" >> "$LOG"
    if echo "$res" | grep -q "err mean"; then return 0; fi
    echo "  attempt $attempt failed; waiting for TPU recovery" >> "$LOG"
    tpu_wait
  done
  echo "  GAVE UP on [$out] $*" >> "$LOG"
  return 1
}

seg result_log_ac3m_rb --equation allencahn_2d-mix-sincos --quiet \
    --dtype float32 --jitter 1e-5 --nepoch 3000000

echo "=== campaign J complete $(date +%H:%M:%S)" >> "$LOG"
