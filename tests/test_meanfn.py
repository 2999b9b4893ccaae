"""Polynomial mean functions (universal kriging): u = H beta + GP.

The trend enters every likelihood term linearly, so in profiled mode the
joint (ut, beta) conditional optimum is one (N+p)-dim SPD solve
(ops/profile1d.linear_ut_beta_star) and the marginal objective's Occam term
uses the augmented system. Checks: basis derivatives, joint stationarity,
exactness of the marginal vs a brute-force (N+p)-dim Gaussian integral,
exact recovery of a polynomial solution, adam-mode training of beta, and
default-off backward compatibility.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.models.solver_1d import Solver1D
from gphm_tpu.ops.meanfn import poly_basis
from gphm_tpu.ops.profile1d import BETA_PRIOR_PREC
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import Problem1D, make_problem

POLICY = Policy(dtype=jnp.float64, max_jitter_tries=0)
CFG = dict(Q=8, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
           freq_scale=20.0, jitter=1e-6, u_mode="profiled", mean_poly=2)


def poly_problem(N=40, M=120):
    """Manufactured Poisson problem whose solution IS a polynomial:
    u = 2(x-0.3)^2 + 0.5x - 1, so u_xx = 4 (constant source)."""

    def u(x):
        return 2.0 * (x - 0.3) ** 2 + 0.5 * x - 1.0

    xc = np.linspace(0.0, 1.0, N)
    xt = np.linspace(0.0, 1.0, M)
    bc_idx = np.array([0, N - 1])
    return Problem1D(
        equation="poisson_1d-single_sin",  # registry tag only
        eq_type="poisson_1d",
        X_col=jnp.asarray(xc), bc_idx=jnp.asarray(bc_idx),
        bc_vals=jnp.asarray(u(xc[bc_idx])),
        src=jnp.full((N,), 4.0),
        X_test=jnp.asarray(xt), u_test=jnp.asarray(u(xt)),
        X_col64=xc, X_test64=xt, src64=jnp.full((N,), 4.0))


def make_solver(N=40, **kw):
    prob = make_problem("poisson_1d-single_sin", N_col=N, scale=2 * np.pi)
    return Solver1D(prob, "Matern52_Cos_1d", dict(CFG, **kw), POLICY)


def moderate_params(solver):
    p = solver.init_params()
    p["log_tau"] = jnp.asarray(3.0)
    p["log_v"] = jnp.asarray(1.0)
    return p


def test_poly_basis_derivatives_match_finite_differences():
    x = np.linspace(0.2, 1.7, 301)
    H, Hd, Hdd = poly_basis(x, 4, (0.2, 1.7))
    h = x[1] - x[0]
    d1 = (H[2:] - H[:-2]) / (2 * h)
    d2 = (H[2:] - 2 * H[1:-1] + H[:-2]) / h ** 2
    # central differences carry O(h^2 f''') truncation ~2e-4 here
    np.testing.assert_allclose(Hd[1:-1], d1, rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(Hdd[1:-1], d2, rtol=1e-3, atol=5e-3)
    # constant column: no derivatives
    assert np.all(Hd[:, 0] == 0) and np.all(Hdd[:, 0] == 0)


def test_joint_ut_beta_star_is_conditional_optimum():
    solver = make_solver()
    p = moderate_params(solver)
    ut, beta = solver._u_beta_star(p)
    star = dict(p, u=ut, beta=beta)
    g = jax.grad(solver._loss)(star)
    g0 = jax.grad(solver._loss)(
        dict(p, u=jnp.zeros_like(ut), beta=jnp.zeros_like(beta)))
    scale = float(jnp.linalg.norm(g0["u"])) \
        + float(jnp.linalg.norm(g0["beta"]))
    assert float(jnp.linalg.norm(g["u"])) < 1e-6 * scale
    assert float(jnp.linalg.norm(g["beta"])) < 1e-6 * scale
    # perturbing either block strictly increases the loss
    l_star = float(solver._loss(star))
    rng = np.random.default_rng(0)
    for _ in range(3):
        du = jnp.asarray(rng.normal(size=ut.shape)) * 1e-3
        db = jnp.asarray(rng.normal(size=beta.shape)) * 1e-3
        assert float(solver._loss(dict(star, u=ut + du))) > l_star
        assert float(solver._loss(dict(star, beta=beta + db))) > l_star


def test_marginal_with_trend_is_exact_joint_gaussian_integral():
    """The mean-function marginal equals the brute-force Gaussian integral
    over the STACKED latent — value and hyperparameter gradients.

    Brute force parametrizes in (g, beta) with u = g + H beta (the GP part
    plus the trend; unit-Jacobian shear, so the integral is unchanged).
    The (u, beta) parametrization is mathematically identical but its
    Hessian carries Kinv in the cross-blocks and loses ~3 digits at this
    conditioning (validated against an iteratively-refined longdouble
    evaluation: (g, beta) matches to 8e-8, (u, beta) is off by 3.6e-3)."""
    solver = make_solver(18, jitter=1e-4)
    p = moderate_params(solver)
    n, nb = solver.N_col, solver.n_beta
    z0 = jnp.zeros(n + nb)

    def brute(params):
        K, Kd = solver._K_and_Kd(params["kernel_paras"])
        wt = solver.llk_weight * jnp.exp(params["log_tau"])
        v = jnp.exp(params["log_v"])
        mask = solver._bc_mask.reshape(-1)
        b = solver._bc_b.reshape(-1)
        f = solver.src_loss.reshape(-1)
        H = solver._H64.astype(K.dtype)
        Hdd = solver._Hdd64.astype(K.dtype)
        Kinv = jnp.linalg.inv(K)
        A = Kd @ Kinv

        def E(z):
            g, beta = z[:n], z[n:]
            u = g + H @ beta
            return (0.5 * jnp.linalg.slogdet(K)[1]
                    + 0.5 * g @ (Kinv @ g)
                    + 0.5 * BETA_PRIOR_PREC * beta @ beta
                    - 0.5 * nb * jnp.log(BETA_PRIOR_PREC)
                    + 0.5 * wt * jnp.sum(mask * (u - b) ** 2)
                    - 0.5 * solver.N_b * jnp.log(wt)
                    + 0.5 * v * jnp.sum((A @ g + Hdd @ beta - f) ** 2)
                    - 0.5 * solver.N_col * params["log_v"])

        Hess = jax.hessian(E)(z0)
        z_star = jnp.linalg.solve(Hess, -jax.grad(E)(z0))
        return E(z_star) + 0.5 * jnp.linalg.slogdet(Hess)[1]

    def ours(params):
        ut, beta = solver._u_beta_star(params)
        return solver._loss(dict(params,
                                 u=jax.lax.stop_gradient(ut),
                                 beta=jax.lax.stop_gradient(beta)))

    np.testing.assert_allclose(float(ours(p)), float(brute(p)), rtol=1e-6)
    g_ours, g_brute = jax.grad(ours)(p), jax.grad(brute)(p)
    for key in ("log_tau", "log_v"):
        # tau/v sit near their profiled stationary point here: both grads
        # are O(1e-5) against freq grads O(400), i.e. at the f64 noise
        # floor of either evaluation — compare with an absolute tolerance
        # at that scale
        np.testing.assert_allclose(float(g_ours[key]), float(g_brute[key]),
                                   rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g_ours["kernel_paras"]["freq"]),
        np.asarray(g_brute["kernel_paras"]["freq"]), rtol=1e-4, atol=1e-10)


def test_polynomial_solution_recovered_exactly():
    """With mean_poly >= the solution's degree, the trend captures the
    whole solution: a short profiled run lands at machine-level rel-L2
    (the GP part carries ~nothing)."""
    solver = Solver1D(poly_problem(), "Matern52_Cos_1d",
                      dict(CFG, Q=4), POLICY)
    res = solver.train(200, verbose=False, mode="chunked", n_evals=4)
    assert res.min_err < 1e-6, res.min_err


def test_adam_mode_trains_beta():
    prob = poly_problem()
    solver = Solver1D(prob, "Matern52_Cos_1d",
                      dict(CFG, Q=4, u_mode="adam", lr=0.05), POLICY)
    p0 = solver.init_params()
    assert p0["beta"].shape == (3, 1)
    res = solver.train(400, verbose=False, mode="chunked", n_evals=4)
    beta = np.asarray(res.params["beta"]).ravel()
    assert np.any(np.abs(beta) > 1e-3), "beta never moved under Adam"
    l0 = float(solver.loss(p0))
    assert float(solver.loss(res.params)) < l0


def test_mean_poly_default_off_keeps_params_shape():
    solver = make_solver(mean_poly=-1)
    assert solver.n_beta == 0
    assert "beta" not in solver.init_params()


def test_profiled_allencahn_with_trend_rejected():
    prob = make_problem("allencahn_1d-single_sin", N_col=24,
                        scale=2 * np.pi)
    with pytest.raises(ValueError, match="linear residuals"):
        Solver1D(prob, "Matern52_Cos_1d", dict(CFG), POLICY)


def test_trend_plus_line_beats_plain_gp_on_multiscale_source():
    """Miniature x2_add_sinx: u = sin(30x) - 2(x-1/2)^2. The parabola's
    source contribution (-4) sits ~250x below the line's amplitude; with
    the trend the profiled marginal run must land well below the no-trend
    run."""

    def u(x):
        return np.sin(30.0 * x) - 2.0 * (x - 0.5) ** 2

    N, M = 96, 200
    xc = np.linspace(0.0, 1.0, N)
    xt = np.linspace(0.0, 1.0, M)
    src = -900.0 * np.sin(30.0 * xc) - 4.0
    bc_idx = np.array([0, N - 1])
    prob = Problem1D(
        equation="poisson_1d-single_sin", eq_type="poisson_1d",
        X_col=jnp.asarray(xc), bc_idx=jnp.asarray(bc_idx),
        bc_vals=jnp.asarray(u(xc[bc_idx])), src=jnp.asarray(src),
        X_test=jnp.asarray(xt), u_test=jnp.asarray(u(xt)),
        X_col64=xc, X_test64=xt, src64=jnp.asarray(src))
    cfg = dict(CFG, Q=6, freq_scale=6.0, freq_init="spectral")
    err_mean = Solver1D(prob, "Matern52_Cos_1d", cfg, POLICY).train(
        600, verbose=False, mode="chunked", n_evals=8).min_err
    err_plain = Solver1D(prob, "Matern52_Cos_1d",
                         dict(cfg, mean_poly=-1), POLICY).train(
        600, verbose=False, mode="chunked", n_evals=8).min_err
    assert err_mean < 0.5 * err_plain, (err_mean, err_plain)
    assert err_mean < 1e-3, err_mean


def test_trend_ridge_level_diagnostic():
    # ADVICE r2: the two-level ridge select is observable — 0.0 (small)
    # on a well-posed system, and a strict {0.0, 1.0} float either way
    solver = make_solver(mean_poly=2)
    level = solver.trend_ridge_level(moderate_params(solver))
    assert level in (0.0, 1.0)
    assert level == 0.0  # N=40 single_sin at moderate params is well-posed
