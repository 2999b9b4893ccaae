"""Exact 2D Occam term vs the separable surrogate (round-3 VERDICT #2).

The 2D marginal objective's load-bearing term is 0.5 logdet S of the
(N1 N2)^2 profiled normal operator; production uses the separable
eigenbasis surrogate (ops/kron_profile.occam_logdet_2d). These tests pin
the new ground-truth path:

  * the dense assembly ``s_matrix_2d`` IS the operator the profiled CG
    applies (hessian of the whitened quadratic),
  * ``occam_logdet_2d_exact`` equals brute slogdet,
  * with ``occam_2d='exact'`` the solver's marginal loss equals the
    brute-force Gaussian integral of the tempered joint over the grid
    latent — value AND theta-gradient (the 2D analog of
    tests/test_profiled.py's 1D identity, which pins to ~1e-9).

The surrogate-vs-exact *quality* measurement lives in
tools/probe_occam2d.py; the measured relationship is pinned here by
``test_surrogate_tracks_exact_gradient_direction``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.models.solver_2d import Solver2D
from gphm_tpu.ops.kron_profile import (occam_logdet_2d, occam_logdet_2d_exact,
                                       s_matrix_2d)
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem

POLICY = Policy(dtype=jnp.float64, max_jitter_tries=0)
CFG = dict(Q=4, lr=0.01, llk_weight=100.0, logdet=True, tol=-1.0,
           freq_scale=10.0, jitter=1e-6, u_mode="profiled",
           profile_cg_iters=300, profile_objective="marginal")


def make_solver(equation="poisson_2d-sin_sin", N=12, beta=0.0,
                scale=2 * np.pi, **kw):
    prob = make_problem(equation, N_col=N, scale=scale, beta=beta)
    return Solver2D(prob, "Matern52_Cos_1d", dict(CFG, **kw), POLICY)


def moderate_params(solver):
    p = solver.init_params()
    p["log_tau"] = jnp.asarray(3.0)
    p["log_v"] = jnp.asarray(1.0)
    return p


def grams(solver, p):
    K1, Kd1 = solver._K_and_Kd(solver.x_col, solver.axis1,
                               p["kernel_paras_1"])
    K2, Kd2 = solver._K_and_Kd(solver.y_col, solver.axis2,
                               p["kernel_paras_2"])
    wt = solver.llk_weight * jnp.exp(p["log_tau"])
    v = jnp.exp(p["log_v"])
    a1 = jnp.asarray(solver.beta if solver.eq_type == "advection" else 1.0,
                     K1.dtype)
    return K1, Kd1, K2, Kd2, wt, v, a1


@pytest.mark.parametrize("equation,beta,scale", [
    ("poisson_2d-sin_sin", 0.0, 2 * np.pi),
    ("advection-sin", 5.0, 1.0),
])
def test_s_matrix_is_the_whitened_loss_hessian(equation, beta, scale):
    """The dense S equals the hessian of the loss's exact quadratic in the
    whitened latent — i.e. the matrix the profiled CG applies matrix-free
    (same identity as test_profiled_2d.test_u_star_solves_dense_normal_
    equations, but for the assembled matrix itself)."""
    solver = make_solver(equation, N=9, beta=beta, scale=scale,
                         profile_objective="map")
    p = moderate_params(solver)

    def f(vecV):
        return solver._loss({**p, "U": vecV.reshape(solver.N1, solver.N2)})

    H = jax.hessian(f)(jnp.zeros(solver.N1 * solver.N2))
    K1, Kd1, K2, Kd2, wt, v, a1 = grams(solver, p)
    S = s_matrix_2d(K1, Kd1, K2, Kd2, solver._bc_mask, wt, v, a1)
    np.testing.assert_allclose(np.asarray(S), np.asarray(H),
                               rtol=1e-9, atol=1e-9 * float(jnp.max(H)))


def test_exact_occam_matches_brute_slogdet():
    solver = make_solver(N=11)
    p = moderate_params(solver)
    K1, Kd1, K2, Kd2, wt, v, a1 = grams(solver, p)
    S = s_matrix_2d(K1, Kd1, K2, Kd2, solver._bc_mask, wt, v, a1)
    want = 0.5 * jnp.linalg.slogdet(S)[1]
    got = occam_logdet_2d_exact(K1, Kd1, K2, Kd2, solver._bc_mask,
                                a1, wt, v)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-10)


def test_exact_occam_augmented_matches_brute_slogdet():
    """Trend-augmented exact Occam = slogdet of the assembled (V, beta)
    block system including the coupling C that the separable path drops."""
    from gphm_tpu.ops.kron_profile import trend_block
    from gphm_tpu.ops.profile1d import BETA_PRIOR_PREC
    solver = make_solver(N=10, mean_poly=2)
    p = moderate_params(solver)
    K1, Kd1, K2, Kd2, wt, v, a1 = grams(solver, p)
    d = K1.dtype
    H1, H2 = solver._H1.astype(d), solver._H2.astype(d)
    H1D, H2D = solver._H1dd.astype(d), solver._H2dd.astype(d)
    S = s_matrix_2d(K1, Kd1, K2, Kd2, solver._bc_mask, wt, v, a1)
    G = jnp.kron(K1, K2)
    Hk = jnp.kron(H1, H2)
    W = a1 * jnp.kron(Kd1, K2) + jnp.kron(K1, Kd2)
    Wb = a1 * jnp.kron(H1D, H2) + jnp.kron(H1, H2D)
    C = wt * (G @ (solver._bc_mask.reshape(-1, 1) * Hk)) + v * (W.T @ Wb)
    r1 = jnp.zeros(solver.N1, d).at[0].set(1.0).at[-1].set(1.0)
    r2 = jnp.zeros(solver.N2, d).at[0].set(1.0).at[-1].set(1.0)
    Qb = trend_block(H1, H1D, H2, H2D, r1, r2, wt, v, a1,
                     jnp.asarray(BETA_PRIOR_PREC, d))
    Sx = jnp.block([[S, C], [C.T, Qb]])
    want = 0.5 * jnp.linalg.slogdet(Sx)[1]
    got = occam_logdet_2d_exact(
        K1, Kd1, K2, Kd2, solver._bc_mask, a1, wt, v,
        H1=H1, H1D=H1D, H2=H2, H2D=H2D,
        eps=jnp.asarray(BETA_PRIOR_PREC, d))
    # the equilibrated factor's stability ridge perturbs the smallest
    # (beta-prior) directions by ~4 eps relative — measured 3.7e-7 here
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_exact_marginal_is_brute_force_gaussian_integral_2d():
    """With occam_2d='exact' the profiled marginal loss equals the
    brute-force Gaussian integral of the tempered joint over the grid
    latent — value AND theta-gradient (2D analog of the 1D identity in
    tests/test_profiled.py, which this pins for the first time;
    round-3 VERDICT weak #2)."""
    solver = make_solver(N=9, occam_2d="exact")
    p = moderate_params(solver)
    N1, N2 = solver.N1, solver.N2

    def brute(params):
        K1, Kd1, K2, Kd2, wt, v, a1 = grams(solver, params)
        Ki1, Ki2 = jnp.linalg.inv(K1), jnp.linalg.inv(K2)

        def E(vecu):
            U = vecu.reshape(N1, N2)
            U_dx = (Kd1 @ Ki1) @ U
            U_dy = U @ (Ki2 @ Kd2.T)
            bg = jnp.sum((solver.boundary_slice(U) - solver.bc_vals) ** 2)
            eq = jnp.sum(solver.residual(U, U_dx, U_dy) ** 2)
            return (0.5 * N2 * jnp.linalg.slogdet(K1)[1]
                    + 0.5 * N1 * jnp.linalg.slogdet(K2)[1]
                    + 0.5 * jnp.sum((Ki1 @ U @ Ki2) * U)
                    + 0.5 * wt * bg - 0.5 * solver.Nb * jnp.log(wt)
                    + 0.5 * v * eq - 0.5 * solver.Nc * params["log_v"])

        z = jnp.zeros(N1 * N2)
        H = jax.hessian(E)(z)
        u_star = jnp.linalg.solve(H, -jax.grad(E)(z))
        # -log int e^{-E(u)} du, dropping the (N/2) log 2pi constant
        return E(u_star) + 0.5 * jnp.linalg.slogdet(H)[1]

    def profiled_loss(params):
        V = jax.lax.stop_gradient(solver._u_star(params))
        return solver._loss({**params, "U": V})

    want, got = float(brute(p)), float(profiled_loss(p))
    np.testing.assert_allclose(got, want, rtol=1e-9)
    gb = jax.grad(brute)(p)
    gp = jax.grad(profiled_loss)(p)
    for key in ("log_tau", "log_v"):
        np.testing.assert_allclose(float(gp[key]), float(gb[key]),
                                   rtol=1e-6)
    for ax in ("kernel_paras_1", "kernel_paras_2"):
        for leaf in gb[ax]:
            np.testing.assert_allclose(
                np.asarray(gp[ax][leaf]), np.asarray(gb[ax][leaf]),
                rtol=1e-5, atol=1e-10 * float(jnp.max(jnp.abs(gb[ax][leaf]))
                                              + 1.0))


def test_exact_occam_rejects_large_grids():
    with pytest.raises(ValueError, match="4096"):
        make_solver(N=70, occam_2d="exact")


def test_slq_occam_tracks_exact_value_and_gradient():
    """The SLQ-corrected term (occam_2d='slq') = separable value + Lanczos
    quadrature of the preconditioned remainder. At a moderate point it must
    beat the bare surrogate's value error and track the exact gradient
    (Hutchinson with 16 fixed probes measured at cos 0.997 / relerr 0.08
    here — the fixed-seed bias is constant across steps)."""
    from gphm_tpu.ops.kron_profile import occam_logdet_2d_slq
    solver = make_solver(N=12)
    p = moderate_params(solver)

    def wrap(fn, **kw):
        def f(params):
            K1, Kd1, K2, Kd2, wt, v, a1 = grams(solver, params)
            if fn is occam_logdet_2d:
                return fn(K1, Kd1, K2, Kd2, a1, wt, v)
            if fn is occam_logdet_2d_exact:
                return fn(K1, Kd1, K2, Kd2, solver._bc_mask, a1, wt, v)
            return fn(K1, Kd1, K2, Kd2, a1, wt, v, **kw)
        return jax.value_and_grad(f)(p)

    ve, ge = wrap(occam_logdet_2d_exact)
    vs, _ = wrap(occam_logdet_2d)
    vq, gq = wrap(occam_logdet_2d_slq, probes=16, lanczos_iters=40,
                  cg_iters=200)
    assert abs(float(vq - ve)) < 0.3 * abs(float(vs - ve)) + 1e-6

    def flat(g):
        return jnp.concatenate(
            [jnp.atleast_1d(g["log_tau"]), jnp.atleast_1d(g["log_v"])]
            + [g[ax][leaf].reshape(-1)
               for ax in ("kernel_paras_1", "kernel_paras_2")
               for leaf in sorted(g[ax])])

    fe, fq = flat(ge), flat(gq)
    cos = float(jnp.vdot(fe, fq)
                / (jnp.linalg.norm(fe) * jnp.linalg.norm(fq)))
    assert cos > 0.98
    assert float(jnp.linalg.norm(fq - fe) / jnp.linalg.norm(fe)) < 0.2


def test_slq_occam_drives_the_solver_loss():
    """occam_2d='slq' composes with the profiled marginal loss end to end
    (finite value, finite envelope gradient)."""
    solver = make_solver(N=12, occam_2d="slq", slq_probes=4, slq_iters=20)
    p = moderate_params(solver)

    def profiled_loss(params):
        V = jax.lax.stop_gradient(solver._u_star(params))
        return solver._loss({**params, "U": V})

    val, g = jax.value_and_grad(profiled_loss)(p)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)


def test_surrogate_tracks_exact_gradient_direction():
    """Measured relationship (tools/probe_occam2d.py): at moderate
    hyperparameters the separable surrogate's gradient points within ~25
    degrees of the exact logdet-S gradient over the kernel+precision
    directions. This is a tracking pin, not a claim of unbiasedness —
    the probe measures the bias along real training trajectories."""
    solver = make_solver(N=12)
    p = moderate_params(solver)

    def flat(fn):
        def f(params):
            K1, Kd1, K2, Kd2, wt, v, a1 = grams(solver, params)
            if fn is occam_logdet_2d:
                return fn(K1, Kd1, K2, Kd2, a1, wt, v)
            return fn(K1, Kd1, K2, Kd2, solver._bc_mask, a1, wt, v)
        g = jax.grad(f)(p)
        leaves = ([g["log_tau"], g["log_v"]]
                  + [g[ax][leaf].reshape(-1)
                     for ax in ("kernel_paras_1", "kernel_paras_2")
                     for leaf in sorted(g[ax])])
        return jnp.concatenate([jnp.atleast_1d(x) for x in leaves])

    ge = flat(occam_logdet_2d_exact)
    gs = flat(occam_logdet_2d)
    cos = float(jnp.vdot(ge, gs)
                / (jnp.linalg.norm(ge) * jnp.linalg.norm(gs)))
    assert cos > 0.9


def test_slq_cv_gradient_reduces_probe_variance():
    """Round-5 stabilization (round-4 VERDICT #2): the control-variated
    Hutchinson remainder's gradient noise must be far below the round-4
    plain-Hutchinson estimator's — the plain form replaced the ENTIRE
    separable gradient with a probe-noisy estimate (measured in-loop
    divergence, PARITY campaign Y2); the CV form's noise scales with the
    remainder only. Measured here across probe seeds at few probes."""
    from gphm_tpu.ops.kron_profile import occam_logdet_2d_slq
    solver = make_solver(N=12)
    p = moderate_params(solver)

    def flat(g):
        return jnp.concatenate(
            [jnp.atleast_1d(g["log_tau"]), jnp.atleast_1d(g["log_v"])]
            + [g[ax][leaf].reshape(-1)
               for ax in ("kernel_paras_1", "kernel_paras_2")
               for leaf in sorted(g[ax])])

    def grad_at(seed, cv):
        def f(params):
            K1, Kd1, K2, Kd2, wt, v, a1 = grams(solver, params)
            return occam_logdet_2d_slq(K1, Kd1, K2, Kd2, a1, wt, v,
                                       probes=4, lanczos_iters=30,
                                       cg_iters=200, seed=seed, cv=cv)
        return np.asarray(flat(jax.grad(f)(p)))

    seeds = range(5)
    g_cv = np.stack([grad_at(s, True) for s in seeds])
    g_plain = np.stack([grad_at(s, False) for s in seeds])
    spread_cv = float(np.linalg.norm(g_cv.std(axis=0)))
    spread_plain = float(np.linalg.norm(g_plain.std(axis=0)))
    assert spread_cv < 0.5 * spread_plain, (spread_cv, spread_plain)

    # and the CV mean still tracks the exact gradient tightly
    def exact_flat(params):
        K1, Kd1, K2, Kd2, wt, v, a1 = grams(solver, params)
        return occam_logdet_2d_exact(K1, Kd1, K2, Kd2, solver._bc_mask,
                                     a1, wt, v)
    ge = np.asarray(flat(jax.grad(exact_flat)(p)))
    gm = g_cv.mean(axis=0)
    cos = float(gm @ ge / (np.linalg.norm(gm) * np.linalg.norm(ge)))
    assert cos > 0.98
    assert float(np.linalg.norm(gm - ge) / np.linalg.norm(ge)) < 0.2
