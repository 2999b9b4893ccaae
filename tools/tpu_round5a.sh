#!/bin/bash
# Round-5 chain, stage A (r4 VERDICT #4, #5a, #5b).
#
#   1. x2_add_sinx reference-protocol stream — the missing crossing-table
#      row (VERDICT #5b). Dense eval cadence; the adam trajectory matches
#      the reference to ~1e-13, so its crossing epoch IS the reference's.
#   2. mix_sin occam-RAMP leg (VERDICT #4, lever 1 of 2): continuous
#      evidence tempering from ep0 on the marginal objective — no
#      MAP-gradient segment for the impropriety cliff to fire in.
#      Target: <= 3.3e-4 with ZERO rollbacks.
#   3. mix_sin reference-protocol stream, leg 1 of N (VERDICT #5a): the
#      table's strongest claim ("the reference protocol cannot solve
#      mix_sin to 1e-2") currently rests on 22% of the 1e6 budget. Full
#      checkpoint archiving (atomic writes) makes the stream resumable
#      across legs/rotations; stage B+ continue it with --resume.
#
# Per-leg archiving; probe gate between legs (graceful-TERM probes with
# a patient 240 s budget — 90 s probes time out in the degraded-init
# state and each kill deepens the wedge; see PARITY round-5 incident
# notes).
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

# Probe protocol (measured 2026-08-21, PARITY round-5 incident): ANY
# killed probe client — TERM or KILL — re-arms a ~10-15 min lockout in
# the serializing terminal, so short-timeout probe loops perpetuate the
# wedge they are probing for. One PATIENT probe (900 s: covers degraded
# init + single-core host contention) succeeds whenever the device is
# free; after a failure, a LONG quiet sleep lets the lockout expire.
probe_wait() {
  until timeout 900 python tools/tpu_probe.py; do
    echo "device wedged; quiet-waiting 600s"
    sleep 600
  done
}

arc() { python tools/archive_streams.py result_log_r5x result_log_r5z \
          2>/dev/null; }
ref() { probe_wait; timeout "$1" python -m gphm_tpu.cli --no-figures \
          --reference-protocol --out result_log_r5x "${@:2}"; arc; }
run() { probe_wait; timeout "$1" python -m gphm_tpu.cli --no-figures "${@:2}"; arc; }

ref 2400 --equation poisson_1d-x2_add_sinx --n-evals 400
run 2700 --out result_log_r5z --equation poisson_1d-mix_sin \
    --profile-objective marginal --occam-ramp 0.3 --n-evals 100
ref 3600 --equation poisson_1d-mix_sin --n-evals 400
echo "campaign chain r5a done"
