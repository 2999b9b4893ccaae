"""Per-component timing of the refined tier on TPU (diagnosis tool).

Round-2 probe: the refined (f32-factor-preconditioned f64 PCG) training step
measured ~260 ms/epoch at N=400 inside the CLI — ~200x the plain-f32 step.
This script times each stage of the step in isolation to find where the
emulated-f64 cost actually lives.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / n * 1000
    print(f"{name:46s} {ms:9.3f} ms", flush=True)
    return ms


def main(N=400, Q=30, iters=8):
    from gphm_tpu.models.solver_1d import Solver1D
    from gphm_tpu.ops.chol import robust_cholesky
    from gphm_tpu.ops.refined import explicit_inverse, _pcg
    from gphm_tpu.precision import Policy
    from gphm_tpu.problems.equations import make_problem

    jax.config.update("jax_enable_x64", True)
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

    prob = make_problem("poisson_1d-x2_add_sinx", N_col=N, scale=1.0,
                        dtype=jnp.float32)
    cfg = dict(Q=Q, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
               freq_scale=100.0, jitter=1e-6)
    pol = Policy(dtype=jnp.float32, refine_iters=iters)
    solver = Solver1D(prob, "Matern52_Cos_1d", cfg, pol)
    params = solver.init_params()

    # components
    kp = params["kernel_paras"]
    kp64 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), kp)

    gram64 = jax.jit(lambda kp: solver.axis.gram(
        solver.kernel, kp, jitter=1e-6, wide=True))
    K64 = gram64(kp64)
    timeit(gram64, kp64, name="f64 Gram (Toeplitz lags + gather)")

    gram32 = jax.jit(lambda kp: solver.axis.gram(
        solver.kernel, kp, jitter=1e-6, wide=False))
    timeit(gram32, jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), kp), name="f32 Gram (exact-phase)")

    chol32 = jax.jit(lambda K: robust_cholesky(
        K.astype(jnp.float32), 1e-6, 100.0, 3).L)
    L32 = chol32(K64)
    timeit(chol32, K64, name="f32 robust_cholesky")

    inv32 = jax.jit(explicit_inverse)
    Pinv = inv32(L32)
    timeit(inv32, L32, name="explicit_inverse (trisolve + syrk)")

    u = params["u"].astype(jnp.float64)
    solve_vec = jax.jit(lambda K, P, b: _pcg(K, P, b, iters))
    timeit(solve_vec, K64, Pinv, u, name=f"PCG x{iters} vec rhs (N,1)")

    eye = jnp.eye(N, dtype=jnp.float64)
    solve_mat = jax.jit(lambda K, P: _pcg(K, P, eye, iters))
    timeit(solve_mat, K64, Pinv, name=f"PCG x{iters} matrix rhs (N,N)")

    gemm64 = jax.jit(lambda A, B: A @ B)
    timeit(gemm64, K64, K64, name="single f64 GEMM (N,N)@(N,N)")
    timeit(gemm64, K64.astype(jnp.float32), K64.astype(jnp.float32),
           name="single f32 GEMM (N,N)@(N,N)")

    loss_g = jax.jit(jax.value_and_grad(solver._loss))
    timeit(loss_g, params, name="full refined loss value_and_grad")

    # plain f32 for comparison
    sol32 = Solver1D(prob, "Matern52_Cos_1d", cfg, Policy(dtype=jnp.float32))
    timeit(jax.jit(jax.value_and_grad(sol32._loss)), sol32.init_params(),
           name="plain f32 loss value_and_grad")



if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    main(N=N)
