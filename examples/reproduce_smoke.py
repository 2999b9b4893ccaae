"""Reproduce the reference's shipped smoke results.

The reference repo ships two 100-epoch smoke logs
(code/result_log/poisson_1d-single_sin/.../log.txt and
poisson_2d-sin_sin/.../log.txt) with rel-L2 0.2756 / 0.4676. This script
reruns both configurations through gphm_tpu and prints the comparison.

Run in float64 on CPU for bit-faithful parity, or float32 on TPU for speed:
    python examples/reproduce_smoke.py --dtype float64
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float64"])
    args = ap.parse_args()

    if args.dtype == "float64":
        import jax
        jax.config.update("jax_enable_x64", True)

    from gphm_tpu.experiment import run_experiment
    from gphm_tpu.utils.config import load_config

    anchors = {"poisson_1d-single_sin": 0.2756, "poisson_2d-sin_sin": 0.4676}
    for eq, ref in anchors.items():
        cfg = load_config(eq, dtype=args.dtype)
        res = run_experiment(cfg, out_base=None, verbose=False,
                             figures=False, nepoch=100)
        print(f"{eq}: rel-L2 {res.err_mean:.4f} "
              f"(reference smoke {ref}), wall {res.used_time:.1f}s")


if __name__ == "__main__":
    main()
