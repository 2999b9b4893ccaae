#!/bin/bash
# Round-5 chain, stage D: allencahn_2d shipped-default INVESTIGATION.
#
# The stage-B direct measurement of the shipped default (adam f32,
# jitter 1e-5, 1e6 budget) at --n-evals 300 hit NaN at ep553,333 and
# exhausted the rollback policy (min 0.3234) — contradicting the
# round-3 experience behind the YAML's "converges smoothly at 1e-5"
# note (2.7e6 epochs, 7.5e-3). The ONLY protocol difference is the
# eval cadence, which changes the chunked launch partition and hence
# the f32 rounding path. This stage reruns the default EXACTLY as a
# user gets it (default cadence, no flags) to determine whether the
# shipped default converges or the YAML claim is stale.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

probe_wait() {
  until timeout 900 python tools/tpu_probe.py; do
    echo "device wedged; quiet-waiting 600s"
    sleep 600
  done
}

probe_wait
timeout 3300 python -m gphm_tpu.cli --no-figures \
    --out result_log_r5ac --equation allencahn_2d-mix-sincos
python tools/archive_streams.py result_log_r5ac 2>/dev/null

# complete the stage-B x_time_sinx shipped-default stream to its 10000-
# epoch budget END (the wall cap cut it ~ep7200): final_params=best
# applies at run completion, so the stored params_fold0 demonstrates
# the walk-away containment (VERDICT #8) on a finished default run
probe_wait
timeout 1800 python -m gphm_tpu.cli --no-figures \
    --out result_log_r5r --equation poisson_1d-x_time_sinx \
    --n-evals 200 --resume
python tools/archive_streams.py result_log_r5r 2>/dev/null
echo "campaign chain r5d done"
