"""Regenerate the reference's post-hoc analysis figures from checkpoints.

Equivalent of the reference's visualization notebooks
(code/visulization/visualization_1d_pred_sum.ipynb and
visualization_2d_err_sum.ipynb): load trained runs, rebuild the solvers,
and render prediction-vs-truth / shared-scale absolute-error panels.

    python examples/error_maps.py result_log/poisson_2d-sin_sin/*/epoch_*/Q30
"""

import sys

from gphm_tpu.analysis import compare_runs


def main():
    dirs = sys.argv[1:]
    if not dirs:
        print(__doc__)
        return 1
    out = "error_maps.png"
    compare_runs(dirs, out_path=out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
