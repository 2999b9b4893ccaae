"""Beyond-reference scale point: 512^2 (and larger) 2D collocation grids.

The reference tops out at dense N_col = 400-900 per dimension. This script
times the 2D training step at N = 512 per dimension (262k unknowns) under
both solve modes:

  * cholesky — per-dimension dense factors (the Kronecker trick keeps
    this viable far beyond the reference's practical envelope on TPU),
  * cg       — f32-factor-preconditioned CG with exact logdet from the
    factor (round-1's unpreconditioned f32 CG diverged at this
    conditioning; the PCG mode optimizes the SAME objective as cholesky),
  * cg-slq   — strictly matvec-only: unpreconditioned CG + stochastic
    Lanczos-quadrature logdet (ops/slq.py),

and writes one summary line per mode. Usage:
    python tools/bench_largegrid.py [N] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from gphm_tpu.models.base import make_chunk_runner
    from gphm_tpu.models.solver_2d import Solver2D
    from gphm_tpu.precision import Policy
    from gphm_tpu.problems.equations import make_problem
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    prob = make_problem("poisson_2d-sin_sin", N_col=N, scale=2 * np.pi,
                        dtype=jnp.float32)

    # f32 with raised jitter: f64 factorizations inside scanned hot loops
    # crash the current axon TPU backend, and jitter 1e-5 is the measured
    # on-device stability lever (see PARITY.md numerics notes)
    policy = Policy(dtype=jnp.float32, jitter=1e-5)
    variants = [
        ("cholesky", dict(solve="cholesky", logdet=True)),
        ("cg-precond", dict(solve="cg", logdet=True, cg_iters=4)),
        ("cg-slq", dict(solve="cg", logdet=True, cg_precond=False,
                        logdet_mode="slq", slq_probes=4, slq_iters=20,
                        cg_tol=1e-5)),
    ]
    for mode, over in variants:
        try:
            cfg = dict(dict(Q=30, lr=0.01, llk_weight=200.0,
                            tol=-1.0, freq_scale=20.0, jitter=1e-5,
                            cg_tol=1e-6, cg_maxiter=600), **over)
            solver = Solver2D(prob, "Matern52_Cos_1d", cfg, policy)
            rc = make_chunk_runner(solver._loss, solver.optimizer)
            p = solver.init_params()
            o = solver.optimizer.init(p)
            t0 = time.time()
            p, o, l = rc(p, o, steps)
            jax.block_until_ready(l)
            compile_s = time.time() - t0
            t0 = time.time()
            p, o, l = rc(p, o, steps)
            jax.block_until_ready(l)
            ms = (time.time() - t0) / steps * 1000
            err = float(solver.eval_err(p))
            finite = bool(np.isfinite(float(l)) and np.isfinite(err))
            print(f"N={N}^2 solve={mode}: {ms:.2f} ms/epoch "
                  f"(compile {compile_s:.0f}s, loss {float(l):.4g}, "
                  f"rel-L2@{2 * steps} {err:.3f}, finite={finite})",
                  flush=True)
        except Exception as e:
            print(f"N={N}^2 solve={mode}: FAILED ({e})", flush=True)


if __name__ == "__main__":
    main()
