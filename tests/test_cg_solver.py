"""Factorization-free CG solve path (beyond-reference scale tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.models.solver_2d import Solver2D
from gphm_tpu.ops.cg import psd_solve_cg
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem

POLICY = Policy(dtype=jnp.float64, max_jitter_tries=0)


def spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


def test_psd_solve_cg_value_and_grad():
    K = spd(24)
    B = jnp.asarray(np.random.default_rng(1).normal(size=(24, 5)))

    X = psd_solve_cg(K, B, 1e-12, 500)
    np.testing.assert_allclose(np.asarray(X),
                               np.linalg.solve(np.asarray(K), np.asarray(B)),
                               rtol=1e-8)

    # implicit-diff gradients == gradients through a dense solve
    def f_cg(K, B):
        return jnp.sum(jnp.sin(psd_solve_cg(K, B, 1e-13, 1000)))

    def f_dense(K, B):
        return jnp.sum(jnp.sin(jnp.linalg.solve(K, B)))

    gK1, gB1 = jax.grad(f_cg, argnums=(0, 1))(K, B)
    gK2, gB2 = jax.grad(f_dense, argnums=(0, 1))(K, B)
    np.testing.assert_allclose(np.asarray(gB1), np.asarray(gB2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gK1), np.asarray(gK2), rtol=1e-6,
                               atol=1e-10)


def make_solvers(N=24):
    prob = make_problem("poisson_2d-sin_sin", N_col=N, scale=2 * np.pi)
    base = dict(Q=4, lr=0.01, llk_weight=200.0, logdet=False, tol=-1.0,
                freq_scale=20.0, jitter=1e-6)
    chol = Solver2D(prob, "Matern52_Cos_1d", base, POLICY)
    cg = Solver2D(prob, "Matern52_Cos_1d",
                  dict(base, solve="cg", cg_tol=1e-12, cg_maxiter=2000,
                       cg_precond=False),
                  POLICY)
    return chol, cg


def test_cg_loss_matches_cholesky_when_logdet_off():
    chol, cg = make_solvers()
    params = chol.init_params()
    params["U"] = jnp.asarray(
        np.random.default_rng(0).normal(size=params["U"].shape) * 0.1)
    np.testing.assert_allclose(float(cg.loss(params)),
                               float(chol.loss(params)), rtol=1e-9)
    g1 = jax.grad(cg._loss)(params)
    g2 = jax.grad(chol._loss)(params)
    np.testing.assert_allclose(np.asarray(g1["U"]), np.asarray(g2["U"]),
                               rtol=1e-6, atol=1e-8)
    for k in ("log-w", "log-ls", "freq"):
        np.testing.assert_allclose(
            np.asarray(g1["kernel_paras_1"][k]),
            np.asarray(g2["kernel_paras_1"][k]), rtol=1e-5, atol=1e-7)


def test_cg_train_smoke():
    _, cg = make_solvers()
    res = cg.train(nepoch=40, verbose=False)
    assert np.isfinite(res.min_err)


def test_unpreconditioned_cg_requires_logdet_off():
    prob = make_problem("poisson_2d-sin_sin", N_col=12, scale=1.0)
    with pytest.raises(ValueError, match="logdet"):
        Solver2D(prob, "Matern52_Cos_1d",
                 dict(Q=3, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
                      freq_scale=20.0, solve="cg", cg_precond=False), POLICY)


# ---------------------------------------------------------------------------
# Preconditioned CG (VERDICT round-1 item #2): f32-factor PCG solves + exact
# logdet from the factor — same objective as the dense path, logdet included.
# ---------------------------------------------------------------------------

def test_pcg_mode_matches_cholesky_with_logdet():
    prob = make_problem("poisson_2d-sin_sin", N_col=24, scale=2 * np.pi)
    base = dict(Q=4, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
                freq_scale=20.0, jitter=1e-6)
    chol = Solver2D(prob, "Matern52_Cos_1d", base, POLICY)
    pcg = Solver2D(prob, "Matern52_Cos_1d",
                   dict(base, solve="cg", cg_iters=10), POLICY)
    params = chol.init_params()
    params["U"] = jnp.asarray(
        np.random.default_rng(0).normal(size=params["U"].shape) * 0.1)
    np.testing.assert_allclose(float(pcg.loss(params)),
                               float(chol.loss(params)), rtol=1e-6)
    g1 = jax.grad(pcg._loss)(params)
    g2 = jax.grad(chol._loss)(params)
    np.testing.assert_allclose(np.asarray(g1["U"]), np.asarray(g2["U"]),
                               rtol=1e-5, atol=1e-7)


def test_pcg_mode_trajectory_tracks_dense():
    """The VERDICT 'done' criterion in miniature: a preconditioned-CG
    training run follows the dense-Cholesky trajectory."""
    prob = make_problem("poisson_2d-sin_sin", N_col=24, scale=2 * np.pi)
    base = dict(Q=4, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
                freq_scale=20.0, jitter=1e-6)
    res_chol = Solver2D(prob, "Matern52_Cos_1d", base, POLICY).train(
        40, verbose=False, mode="chunked")
    res_pcg = Solver2D(prob, "Matern52_Cos_1d",
                       dict(base, solve="cg", cg_iters=10), POLICY).train(
        40, verbose=False, mode="chunked")
    np.testing.assert_allclose(res_pcg.log["err_list"],
                               res_chol.log["err_list"], rtol=1e-4)


# ---------------------------------------------------------------------------
# Stochastic Lanczos-quadrature logdet (matvec-only tier, ops/slq.py)
# ---------------------------------------------------------------------------

def test_slq_logdet_value():
    from gphm_tpu.ops.slq import rademacher_probes, slq_logdet

    K = spd(64, seed=2)
    Z = rademacher_probes(64, 16, K.dtype, seed=0)
    est = float(slq_logdet(K, Z, 30, 1e-10, 500))
    exact = float(jnp.linalg.slogdet(K)[1])
    assert abs(est - exact) / abs(exact) < 0.05, (est, exact)


def test_slq_logdet_gradient_unbiasedness():
    """The Hutchinson gradient estimator converges to K^-1 as probes grow."""
    from gphm_tpu.ops.slq import rademacher_probes, slq_logdet

    K = spd(24, seed=3)
    Z = rademacher_probes(24, 256, K.dtype, seed=1)
    g = jax.grad(lambda K: slq_logdet(K, Z, 24, 1e-12, 500))(K)
    exact = jnp.linalg.inv(K)
    # 256 probes: ~1/sqrt(256) statistical error on O(1)-scaled entries
    err = np.abs(np.asarray(g - exact)).max() / np.abs(np.asarray(exact)).max()
    assert err < 0.35, err


def test_slq_cg_training_statistically_matches_dense():
    """64^2-style miniature: CG + SLQ logdet optimizes the same objective as
    dense Cholesky (logdet on), trajectories agree to the estimator noise."""
    prob = make_problem("poisson_2d-sin_sin", N_col=24, scale=2 * np.pi)
    base = dict(Q=4, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
                freq_scale=20.0, jitter=1e-6)
    res_chol = Solver2D(prob, "Matern52_Cos_1d", base, POLICY).train(
        60, verbose=False, mode="chunked")
    slq = Solver2D(prob, "Matern52_Cos_1d",
                   dict(base, solve="cg", cg_precond=False,
                        logdet_mode="slq", slq_probes=8, slq_iters=24,
                        cg_tol=1e-10, cg_maxiter=1000), POLICY)
    res_slq = slq.train(60, verbose=False, mode="chunked")
    e1 = np.asarray(res_chol.log["err_list"])
    e2 = np.asarray(res_slq.log["err_list"])
    assert np.isfinite(e2).all()
    # same objective up to O(1/sqrt(M)) logdet noise: errors track closely
    np.testing.assert_allclose(e2, e1, rtol=0.05)


def test_slq_requires_matvec_only_tier():
    """logdet_mode='slq' anywhere a factor exists is a config conflict: the
    user would silently measure the exact-factor logdet instead of SLQ."""
    prob = make_problem("poisson_2d-sin_sin", N_col=16, scale=2 * np.pi)
    base = dict(Q=2, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
                freq_scale=20.0, jitter=1e-6)
    with pytest.raises(ValueError, match="matvec-only"):
        Solver2D(prob, "Matern52_Cos_1d",
                 dict(base, solve="cg", logdet_mode="slq"), POLICY)
    with pytest.raises(ValueError, match="matvec-only"):
        Solver2D(prob, "Matern52_Cos_1d",
                 dict(base, logdet_mode="slq"), POLICY)
