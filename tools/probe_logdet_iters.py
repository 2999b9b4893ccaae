"""Gradient-quality vs cost for the refined tier's logdet-gradient knob.

The logdet gradient is the only matrix-RHS PCG in a refined step (K^-1 on
the identity), measured at 34 of 52 ms per step at N=400. This probe loads
realistically-trained parameters (the round-1 x2_add_sinx change_point=0.5
base GP, 500k f32 epochs) and compares the full loss gradient at
refine_logdet_iters in {0, 2, 4, 8} against a true-f64 reference computed
on the CPU device, reporting relative errors per parameter group and the
measured step time on TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from gphm_tpu.models.solver_1d import Solver1D
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem
from gphm_tpu.utils.checkpoint import load_checkpoint

CKPT = ("result_log_cp05/poisson_1d-x2_add_sinx/"
        "kernel_Matern52_Cos_1d-extra-Matern52_1d/epoch_1000000/Q30/"
        "base_params_fold0.npz")
CFG = dict(Q=30, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
           freq_scale=100.0, jitter=1e-6)


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))


def grad_of(solver, params):
    g = jax.jit(jax.grad(solver._loss))(params)
    jax.block_until_ready(g)
    return g


def main():
    prob = make_problem("poisson_1d-x2_add_sinx", N_col=400, scale=1.0,
                        dtype=jnp.float32)
    tmpl = Solver1D(prob, "Matern52_Cos_1d", CFG,
                    Policy(dtype=jnp.float32)).init_params()
    params32 = load_checkpoint(CKPT, tmpl)
    params64 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float64), params32)

    # true-f64 reference on the CPU device (blocked factorization path)
    cpu = jax.devices("cpu")[0]
    prob64 = make_problem("poisson_1d-x2_add_sinx", N_col=400, scale=1.0,
                          dtype=jnp.float64)
    with jax.default_device(cpu):
        s64 = Solver1D(prob64, "Matern52_Cos_1d", CFG,
                       Policy(dtype=jnp.float64, max_jitter_tries=0))
        g_ref = jax.tree_util.tree_map(
            np.asarray, grad_of(s64, jax.device_put(params64, cpu)))
    print("f64 reference gradient computed on CPU", flush=True)

    # plain f32 for context
    s32 = Solver1D(prob, "Matern52_Cos_1d", CFG, Policy(dtype=jnp.float32))
    g32 = grad_of(s32, params32)
    print(f"plain f32:            u {rel(g32['u'], g_ref['u']):8.2e}  "
          f"ls {rel(g32['kernel_paras']['log-ls'], g_ref['kernel_paras']['log-ls']):8.2e}  "
          f"freq {rel(g32['kernel_paras']['freq'], g_ref['kernel_paras']['freq']):8.2e}",
          flush=True)

    for ld_it in (8, 4, 2, 0):
        pol = Policy(dtype=jnp.float32, refine_iters=8,
                     refine_logdet_iters=ld_it)
        s = Solver1D(prob, "Matern52_Cos_1d", CFG, pol)
        g = grad_of(s, params32)
        f = jax.jit(jax.value_and_grad(s._loss))
        out = f(params32); jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(20):
            out = f(params32)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / 20 * 1000
        print(f"refined ld_iters={ld_it}:  "
              f"u {rel(g['u'], g_ref['u']):8.2e}  "
              f"ls {rel(g['kernel_paras']['log-ls'], g_ref['kernel_paras']['log-ls']):8.2e}  "
              f"freq {rel(g['kernel_paras']['freq'], g_ref['kernel_paras']['freq']):8.2e}  "
              f"logw {rel(g['kernel_paras']['log-w'], g_ref['kernel_paras']['log-w']):8.2e}  "
              f"[{ms:6.2f} ms/step]", flush=True)


if __name__ == "__main__":
    main()
