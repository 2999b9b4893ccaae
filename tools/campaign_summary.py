"""Summarize round-2 campaign artifacts: min rel-L2 / wall per run dir."""

import math
import glob
import json
import os
import sys

BASES = ["result_log_sched", "result_log_sched_n900", "result_log_xts_r1",
         "result_log_xts_r2", "result_log_xts_r3", "result_log_matrix",
         "result_log_j5"]


def main():
    for base in (sys.argv[1:] or BASES):
        for metrics in sorted(glob.glob(os.path.join(
                base, "*", "*", "*", "*", "metrics_fold0.jsonl"))):
            rows = [json.loads(l) for l in open(metrics) if l.strip()]
            # multi_start info records have no rel_l2; NaN evals (diverged
            # epochs under nan_policy='warn'/rollback) would poison min()
            erows = [r for r in rows
                     if math.isfinite(r.get("rel_l2", float("nan")))]
            if not erows:
                if rows:
                    print(f"{base:24s} {metrics}: no eval rows "
                          f"({len(rows)} records)")
                continue
            best = min(erows, key=lambda r: r["rel_l2"])
            last = erows[-1]
            d = os.path.dirname(metrics)
            parts = d.split(os.sep)
            print(f"{base:24s} {parts[1]:28s} {parts[2]:40s} "
                  f"evals={len(erows):3d} last_ep={last['epoch']:>8} "
                  f"min_relL2={best['rel_l2']:.3e} (@{best['epoch']}) "
                  f"wall={last['wall_s']:.0f}s")


if __name__ == "__main__":
    main()
