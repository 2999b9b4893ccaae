#!/bin/bash
# Round-2 campaign, part L: collapse the two-GP trick into the mixture.
#
# A Matern52_Cos component with freq ~= 0 IS a Matern52 — so under the
# proper (marginal) profiled objective the reference's two-phase extra-GP
# protocol should be subsumable by a single spectral-init mixture whose
# linspace-coverage components start at freq 0: the evidence objective can
# allocate smooth low-frequency content to those components directly, with
# no change point, no freeze, and no phase-2 objective misalignment (the
# documented failure mode of the shipped protocol on x2_add_sinx).
#
#   L1: x2_add_sinx single-GP marginal + spectral + lr-decay.
#   L2: x2_add_sinx two-GP MAP-profiled + spectral + decay (hedge: the
#       fastest-descending engine measured; decay may hold the dip longer
#       before the documented impropriety cliff; rollback bounds it).
#   L3: mix_sin single-GP marginal + spectral + lr-decay (I2 showed the
#       marginal engine needs spectral init; K5 tests two-GP, this the
#       single-GP analog).
LOG=${1:-/tmp/round2l.log}
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

# L1: the principled protocol — one GP, proper objective, spectral init
seg result_log_l --equation poisson_1d-x2_add_sinx --quiet \
    --u-mode profiled --dtype refined --freq-init spectral \
    --nepoch 20000 --n-evals 400 --lr-decay 0.05

# L2: MAP hedge with decay (campaign-G best: 4.9e-3, no decay)
seg result_log_l_map --equation poisson_1d-x2_add_sinx --extra --quiet \
    --u-mode profiled --dtype refined --freq-init spectral \
    --profile-objective map --change-point 0.5 \
    --nepoch 20000 --n-evals 400 --lr-decay 0.05

# L3: mix_sin single-GP marginal + spectral
seg result_log_l --equation poisson_1d-mix_sin --quiet \
    --u-mode profiled --dtype refined --freq-init spectral \
    --nepoch 20000 --n-evals 400 --lr-decay 0.05

echo "CAMPAIGN-L DONE $(date +%H:%M:%S)" >> "$LOG"
