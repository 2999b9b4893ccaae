"""Refined-solve tier (ops/refined.py) and blocked-linalg pullbacks.

The refined tier is the TPU-native replacement for the reference's global
float64 (reference: code/kernel_matrix.py:6-7): f64 Grams, f32 factorization,
f64-residual refinement sweeps. These tests pin it against true f64 on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.models.solver_1d import Solver1D
from gphm_tpu.ops.chol import robust_cholesky
from gphm_tpu.ops.refined import refined_cholesky
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem


def _ill_conditioned(n=200, cond=1e6, seed=0):
    """SPD matrix with the model's conditioning regime (cond ~ 1/jitter)."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.logspace(0, -np.log10(cond), n)
    return (Q * lam) @ Q.T


def test_refined_solve_reaches_f64_accuracy():
    K = _ill_conditioned()
    rng = np.random.default_rng(1)
    b = rng.standard_normal((K.shape[0], 2))
    x_true = np.linalg.solve(K, b)

    pol = Policy(dtype=jnp.float32, refine_iters=8, max_jitter_tries=0)
    F = refined_cholesky(jnp.asarray(K), pol)
    x_ref = np.asarray(F.solve(jnp.asarray(b)))
    err_refined = np.abs(x_ref - x_true).max() / np.abs(x_true).max()

    # plain f32 solve for contrast
    F32 = robust_cholesky(jnp.asarray(K, jnp.float32), max_tries=0)
    err_f32 = np.abs(np.asarray(F32.solve(jnp.asarray(b, jnp.float32)),
                                np.float64) - x_true).max() \
        / np.abs(x_true).max()

    # PCG contracts ~15x per iteration; 8 iterations reach the f64 floor
    assert err_refined < 1e-9
    assert err_f32 > 1e-4          # the gap the refinement closes
    assert F.solve(jnp.asarray(b)).dtype == jnp.float64

    # extra iterations past the floor are harmless (guarded updates)
    F16 = refined_cholesky(jnp.asarray(K), pol, iters=16)
    err16 = np.abs(np.asarray(F16.solve(jnp.asarray(b))) - x_true).max() \
        / np.abs(x_true).max()
    assert err16 < 1e-9 and np.isfinite(err16)


def test_refined_gradients_flow_through_refinement():
    K0 = jnp.asarray(_ill_conditioned(80, cond=1e5))
    b = jnp.asarray(np.random.default_rng(2).standard_normal((80, 1)))
    pol = Policy(dtype=jnp.float32, refine_iters=8, max_jitter_tries=0)

    def f(s):
        F = refined_cholesky(K0 * s, pol)
        return jnp.sum(b * F.solve(b)) + F.logdet()

    import jax.scipy.linalg as jsl

    def f64(s):
        L = jnp.linalg.cholesky(K0 * s)
        x = jsl.cho_solve((L, True), b)
        return jnp.sum(b * x) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))

    g = jax.grad(f)(jnp.asarray(1.0))
    g64 = jax.grad(f64)(jnp.asarray(1.0))
    assert abs(float(g - g64)) / abs(float(g64)) < 1e-8


def test_blocked_cholesky_pullback(monkeypatch):
    """Regression: the blocked Cholesky VJP must match the native one
    (round 2 fixed a wrong final sandwich factor, L^-T (P+P') L^-T)."""
    from gphm_tpu.ops import blocked_linalg as bl

    K = jnp.asarray(_ill_conditioned(150, cond=1e4, seed=3))
    b = jnp.asarray(np.random.default_rng(4).standard_normal((150, 2)))

    def loss(Kv, chol, lsolve, usolve):
        L = chol(Kv)
        y = lsolve(L, b)
        x = usolve(L.T, y)
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(b * x)

    def f_blocked(s):
        return loss(K * s, lambda A: bl.cholesky(A, 64),
                    lambda L, B: bl.lower_solve(L, B, 64),
                    lambda U, B: bl.upper_solve(U, B, 64))

    import jax.scipy.linalg as jsl

    def f_native(s):
        return loss(K * s, jnp.linalg.cholesky,
                    lambda L, B: jsl.solve_triangular(L, B, lower=True),
                    lambda U, B: jsl.solve_triangular(U, B, lower=False))

    gb = jax.grad(f_blocked)(jnp.asarray(1.0))
    gn = jax.grad(f_native)(jnp.asarray(1.0))
    assert abs(float(gb - gn)) / abs(float(gn)) < 1e-10


def test_refined_loss_matches_f64_on_hard_equation():
    """End to end: the refined training loss and its gradients agree with
    true float64 on the hardest 1D equation (sin 500x) at small N."""
    cfg = dict(Q=6, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
               freq_scale=100.0, jitter=1e-6)
    prob64 = make_problem("poisson_1d-x2_add_sinx", N_col=120, scale=1.0,
                          dtype=jnp.float64)
    prob32 = make_problem("poisson_1d-x2_add_sinx", N_col=120, scale=1.0,
                          dtype=jnp.float32)
    s64 = Solver1D(prob64, "Matern52_Cos_1d", cfg, Policy(dtype=jnp.float64))
    sref = Solver1D(prob32, "Matern52_Cos_1d", cfg,
                    Policy(dtype=jnp.float32, refine_iters=8))
    assert sref.wide_train
    p64, pr = s64.init_params(), sref.init_params()

    l64, lr = float(s64.loss(p64)), float(sref.loss(pr))
    assert abs(lr - l64) / abs(l64) < 1e-6

    g64 = jax.grad(s64._loss)(p64)
    gr = jax.grad(sref._loss)(pr)
    for key in ("log-w", "log-ls", "freq"):
        a = np.asarray(g64["kernel_paras"][key])
        c = np.asarray(gr["kernel_paras"][key])
        assert np.abs(a - c).max() / np.abs(a).max() < 1e-4, key
    a, c = np.asarray(g64["u"]), np.asarray(gr["u"])
    assert np.abs(a - c).max() / np.abs(a).max() < 1e-4


def test_refined_policy_from_config():
    from gphm_tpu.experiment import _policy_for, make_solver
    from gphm_tpu.utils.config import load_config

    cfg = load_config("poisson_1d-x2_add_sinx", dtype="refined", N_col=64)
    pol = _policy_for(cfg)
    assert pol.refine_iters == 8 and pol.dtype == jnp.float32
    solver = make_solver(cfg)
    assert solver.wide_train
    # loss is finite and wide
    loss = solver.loss(solver.init_params())
    assert loss.dtype == jnp.float64 and bool(jnp.isfinite(loss))


def test_batched_chol_toggle_with_refined_policy():
    """batched_chol: true must not crash under the refined tier (its PCG
    custom VJPs are unbatched); the toggle is ignored and the two per-dim
    factors run refined instead — regression for a trace-time batching
    ValueError."""
    from gphm_tpu.models.solver_2d import Solver2D

    prob = make_problem("poisson_2d-sin_sin", N_col=16, scale=2 * np.pi)
    cfg = dict(Q=2, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
               freq_scale=20.0, jitter=1e-6, batched_chol=True)
    solver = Solver2D(prob, "Matern52_Cos_1d", cfg,
                      Policy(dtype=jnp.float32, refine_iters=2))
    params = solver.init_params()
    loss, grads = jax.value_and_grad(solver._loss)(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(g))
               for g in jax.tree_util.tree_leaves(grads))
