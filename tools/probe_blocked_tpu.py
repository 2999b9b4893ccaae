"""TPU probe: can the blocked (custom-call-free) f64 Cholesky/solve tier run
inside a scanned hot loop on this backend, and at what per-step cost?

Round-1 finding (PARITY.md): dense f64 lax.linalg Cholesky/triangular-solve
custom calls crash the TPU worker at N >= 400 in hot loops. The blocked tier
(ops/blocked_linalg.py) is pure matmul/fori_loop HLO and should inherit XLA's
double-word f64 emulation. This probe measures:

  1. f64 matmul sanity + accuracy on the device,
  2. blocked_cholesky f64 at N=400/900 vs host numpy,
  3. full f64 1D training steps (N=400, Q=30) under lax.scan,
  4. the same with gradients (value_and_grad through the custom VJPs).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main():
    from gphm_tpu.ops import blocked_linalg as bl

    dev = jax.devices()[0]
    print("device:", dev, "backend:", jax.default_backend())

    # 1. f64 matmul sanity
    rng = np.random.default_rng(0)
    A = rng.standard_normal((256, 256))
    B = rng.standard_normal((256, 256))
    C = jax.jit(jnp.matmul)(jnp.asarray(A), jnp.asarray(B))
    err = np.abs(np.asarray(C) - A @ B).max() / np.abs(A @ B).max()
    print(f"f64 matmul rel err: {err:.3e} (dtype {C.dtype})")

    # 2. blocked cholesky accuracy at N=400/900
    for N in (400, 900):
        M = rng.standard_normal((N, N))
        K = M @ M.T + N * np.eye(N)
        L_ref = np.linalg.cholesky(K)
        t0 = time.time()
        L = jax.jit(bl.cholesky, static_argnums=1)(jnp.asarray(K), 64)
        L.block_until_ready()
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(5):
            L = jax.jit(bl.cholesky, static_argnums=1)(jnp.asarray(K), 64)
        L.block_until_ready()
        run_ms = (time.time() - t0) / 5 * 1e3
        rel = np.abs(np.asarray(L) - L_ref).max() / np.abs(L_ref).max()
        print(f"blocked chol N={N}: rel err {rel:.3e}, compile {compile_s:.1f}s,"
              f" run {run_ms:.2f} ms")

    # 3/4. full f64 training steps under scan
    from gphm_tpu.models.base import make_chunk_runner
    from gphm_tpu.models.solver_1d import Solver1D
    from gphm_tpu.precision import Policy
    from gphm_tpu.problems.equations import make_problem

    cfg = dict(Q=30, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
               freq_scale=100.0, jitter=1e-6)
    prob = make_problem("poisson_1d-x2_add_sinx", N_col=400, scale=1.0,
                        dtype=jnp.float64)
    policy = Policy(dtype=jnp.float64, jitter=1e-6)
    solver = Solver1D(prob, "Matern52_Cos_1d", cfg, policy)
    params = solver.init_params()
    opt_state = solver.optimizer.init(params)

    runner = make_chunk_runner(solver._loss, solver.optimizer)
    t0 = time.time()
    params, opt_state, loss = runner(params, opt_state, 20)
    jax.block_until_ready(loss)
    print(f"f64 scan(20) compile+run: {time.time() - t0:.1f}s, loss {float(loss):g}")
    t0 = time.time()
    params, opt_state, loss = runner(params, opt_state, 200)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    print(f"f64 scan(200): {dt:.2f}s = {dt / 200 * 1e3:.2f} ms/epoch, "
          f"loss {float(loss):g}")
    err = float(solver.eval_err(params))
    print(f"rel-L2 after 220 epochs: {err:g}")


if __name__ == "__main__":
    main()
