"""Round-3 numerics matrix (VERDICT r2 weak #1): measure what each round-2
default-numerics choice costs on the bench smoke config (1D Poisson
single_sin, Matern52_Cos, Q=30, N_col=400, f32).

Grid: phase_exact x matmul_precision. For each cell: steady-state ms/epoch,
rel-L2 @ 100 epochs (reference smoke anchor 0.2756,
reference: code/result_log/poisson_1d-single_sin/.../log.txt:2), and
optionally the min rel-L2 of a longer run (--long N gives an N-epoch run
with the standard 20-eval cadence).

Usage:  python tools/profile_numerics.py [--long 100000]
"""

import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--long", type=int, default=0,
                    help="also run a full budget per cell (epochs)")
    ap.add_argument("--cells", type=str, default="",
                    help="comma list phase:prec (e.g. on:highest,off:high)")
    args = ap.parse_args()

    import jax

    from gphm_tpu.experiment import make_solver
    from gphm_tpu.models.base import make_chunk_runner
    from gphm_tpu.utils.config import load_config

    log("backend:", jax.default_backend(), jax.devices()[0])

    cells = []
    if args.cells:
        for tok in args.cells.split(","):
            ph, prec = tok.split(":")
            cells.append((ph == "on", prec))
    else:
        cells = [(True, "highest"), (False, "highest"),
                 (True, "high"), (False, "high"), (False, "default")]

    results = []
    for phase_exact, prec in cells:
        cfg = load_config("poisson_1d-single_sin", dtype="float32",
                          reference_protocol=True,
                          phase_exact="on" if phase_exact else "off")
        solver = make_solver(cfg)
        # override the policy-level matmul precision after construction
        jax.config.update("jax_default_matmul_precision", prec)

        params = solver.init_params()
        opt_state = solver.optimizer.init(params)
        run_chunk = make_chunk_runner(solver._loss, solver.optimizer)

        t0 = time.time()
        params, opt_state, loss = run_chunk(params, opt_state, 100)
        jax.block_until_ready(loss)
        compile_s = time.time() - t0
        err100 = float(solver.eval_err(params))

        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            params, opt_state, loss = run_chunk(params, opt_state, 100)
            jax.block_until_ready(loss)
            best = min(best, (time.time() - t0) / 100 * 1000)

        row = dict(phase_exact=phase_exact, prec=prec,
                   ms_per_epoch=round(best, 4), err100=round(err100, 4),
                   compile_s=round(compile_s, 1))

        if args.long:
            t0 = time.time()
            res = make_solver(cfg).train(args.long, verbose=False,
                                         mode="chunked")
            row["long_min_err"] = float(res.min_err)
            row["long_wall_s"] = round(time.time() - t0, 1)
        results.append(row)
        log(row)

    log("\nsummary (anchor err100 ref=0.2756, r01 bench=0.2426/1.284ms, "
        "r02 bench=0.3219/1.500ms):")
    for r in results:
        log(f"  phase={'on ' if r['phase_exact'] else 'off'} "
            f"prec={r['prec']:<8} {r['ms_per_epoch']:.3f} ms/ep  "
            f"err100={r['err100']:.4f}"
            + (f"  long_min={r.get('long_min_err'):.3g} "
               f"({r.get('long_wall_s')}s)" if args.long else ""))


if __name__ == "__main__":
    main()
