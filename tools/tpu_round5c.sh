#!/bin/bash
# Round-5 chain, stage C: the staged-Q mix_sin continuation.
#
# The stage-B staged-Q leg (result_log_r5q) measured min rel-L2
# 7.18e-5 with ZERO rollbacks through the entire historical cliff
# window (ep7-9k) and the full activation schedule (all 30 components
# on from ep12000), but was wall-capped near ep13.5k — before the
# two-GP change point (ep15000) of the 30000-epoch protocol it runs.
# This continuation resumes through the phase switch to the full
# budget, so the shipped-default flip to staged-Q rests on a complete
# measured run.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

probe_wait() {
  until timeout 900 python tools/tpu_probe.py; do
    echo "device wedged; quiet-waiting 600s"
    sleep 600
  done
}

arc() { python tools/archive_streams.py result_log_r5q 2>/dev/null; }

probe_wait
timeout 7200 python -m gphm_tpu.cli --no-figures \
    --out result_log_r5q --equation poisson_1d-mix_sin \
    --staged-q 8:0.4 --freq-init spectral --n-evals 100 --resume
arc
echo "campaign chain r5c done"
