"""Separable polynomial mean function in Solver2D (round-3 VERDICT #8).

The 2D trend U = H1 B H2' rides the Kronecker lifts; the GP prior centers
on it. These tests pin the loss against a brute-force dense construction
of the de-trended objective, the prediction path, and the trend's
gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.models.solver_2d import Solver2D
from gphm_tpu.ops.meanfn import poly_basis
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem

CFG = dict(Q=3, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
           freq_scale=20.0, jitter=1e-6)


def _solvers(eq="poisson_2d-sin_sin", N=14, deg=2, **kw):
    prob = make_problem(eq, N_col=N, scale=1.0, **kw)
    s_t = Solver2D(prob, "Matern52_Cos_1d", dict(CFG, mean_poly=deg),
                   Policy(jnp.float64))
    s_0 = Solver2D(prob, "Matern52_Cos_1d", CFG, Policy(jnp.float64))
    return prob, s_t, s_0


def _rand_params(s_t, seed=0):
    rng = np.random.default_rng(seed)
    p = s_t.init_params()
    p["U"] = jnp.asarray(rng.normal(size=(s_t.N1, s_t.N2)) * 0.1)
    p["beta"] = jnp.asarray(rng.normal(size=(s_t.n_beta, s_t.n_beta)) * 0.5)
    return p


def test_loss_matches_brute_force_detrended_objective():
    """_loss(total U, beta) == the MAP objective computed densely by hand:
    Kronecker prior on U - H1 B H2', analytic trend derivatives in the
    residual, boundary on the total, plus the weak beta prior."""
    from gphm_tpu.ops.profile1d import BETA_PRIOR_PREC

    prob, s_t, _ = _solvers()
    p = _rand_params(s_t)
    got = float(s_t.loss(p))

    # brute force (numpy, dense)
    kp1, kp2 = p["kernel_paras_1"], p["kernel_paras_2"]
    K1 = np.asarray(s_t.axis1.gram(s_t.kernel, kp1, jitter=s_t.jitter))
    Kd1 = np.asarray(s_t.axis1.gram(s_t.kernel, kp1, deriv=2))
    K2 = np.asarray(s_t.axis2.gram(s_t.kernel, kp2, jitter=s_t.jitter))
    Kd2 = np.asarray(s_t.axis2.gram(s_t.kernel, kp2, deriv=2))
    x64 = np.asarray(prob.x_col64)
    y64 = np.asarray(prob.y_col64)
    H1, _, H1dd = poly_basis(x64, s_t.mean_poly,
                             (x64.min(), x64.max()))
    H2, _, H2dd = poly_basis(y64, s_t.mean_poly,
                             (y64.min(), y64.max()))
    B = np.asarray(p["beta"])
    U = np.asarray(p["U"])
    T = H1 @ B @ H2.T
    G = U - T
    K1iG = np.linalg.solve(K1, G)
    K2iGt = np.linalg.solve(K2, G.T)
    quad = np.sum(K1iG * K2iGt.T)
    _, ld1 = np.linalg.slogdet(K1)
    _, ld2 = np.linalg.slogdet(K2)
    log_prior = -0.5 * (s_t.N2 * ld1 + s_t.N1 * ld2) - 0.5 * quad \
        - 0.5 * BETA_PRIOR_PREC * np.sum(B ** 2) \
        + 0.5 * B.size * np.log(BETA_PRIOR_PREC)
    U_xx = Kd1 @ K1iG + H1dd @ B @ H2.T
    U_yy = (Kd2 @ K2iGt).T + H1 @ B @ H2dd.T
    res = U_xx + U_yy - np.asarray(prob.src)
    bvals = np.hstack((U[0, :], U[-1, :], U[:, 0], U[:, -1]))
    bgap = np.sum((bvals - np.asarray(prob.bc_vals)) ** 2)
    egap = np.sum(res ** 2)
    lt, lv = float(p["log_tau"]), float(p["log_v"])
    log_b = 0.5 * s_t.Nb * lt - 0.5 * np.exp(lt) * bgap
    eq_ll = 0.5 * s_t.Nc * lv - 0.5 * np.exp(lv) * egap
    want = -(log_prior + s_t.llk_weight * log_b + eq_ll)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_zero_beta_reduces_to_trendless_loss():
    from gphm_tpu.ops.profile1d import BETA_PRIOR_PREC

    _, s_t, s_0 = _solvers()
    p = _rand_params(s_t)
    p["beta"] = jnp.zeros_like(p["beta"])
    p0 = {k: v for k, v in p.items() if k != "beta"}
    # only the beta-prior normalizer distinguishes the two objectives
    norm = 0.5 * p["beta"].size * np.log(BETA_PRIOR_PREC)
    np.testing.assert_allclose(float(s_t.loss(p)),
                               float(s_0.loss(p0)) - norm, rtol=1e-12)


def test_predict_detrends_and_adds_trend_back():
    prob, s_t, s_0 = _solvers()
    p = _rand_params(s_t)
    preds = np.asarray(s_t.predict(p))
    # manual: trendless predict on the de-trended latent + trend on test grid
    x64, y64 = np.asarray(prob.x_col64), np.asarray(prob.y_col64)
    xt = np.asarray(prob.x_test64)
    yt = np.asarray(prob.y_test64)
    H1, _, _ = poly_basis(x64, s_t.mean_poly, (x64.min(), x64.max()))
    H2, _, _ = poly_basis(y64, s_t.mean_poly, (y64.min(), y64.max()))
    H1t, _, _ = poly_basis(xt, s_t.mean_poly, (x64.min(), x64.max()))
    H2t, _, _ = poly_basis(yt, s_t.mean_poly, (y64.min(), y64.max()))
    B = np.asarray(p["beta"])
    p0 = {k: v for k, v in p.items() if k != "beta"}
    p0["U"] = p["U"] - jnp.asarray(H1 @ B @ H2.T)
    want = np.asarray(s_0.predict(p0)) + H1t @ B @ H2t.T
    np.testing.assert_allclose(preds, want, rtol=1e-8, atol=1e-10)


def test_advection_trend_uses_first_derivatives():
    prob, s_t, _ = _solvers("advection-sin", N=12, deg=2, beta=5.0)
    assert s_t.deriv_order == 1
    p = _rand_params(s_t)
    # residual lift must use H' (not H''): compare against manual
    kp1, kp2 = p["kernel_paras_1"], p["kernel_paras_2"]
    Kd1 = np.asarray(s_t.axis1.gram(s_t.kernel, kp1, deriv=1))
    K1 = np.asarray(s_t.axis1.gram(s_t.kernel, kp1, jitter=s_t.jitter))
    Kd2 = np.asarray(s_t.axis2.gram(s_t.kernel, kp2, deriv=1))
    K2 = np.asarray(s_t.axis2.gram(s_t.kernel, kp2, jitter=s_t.jitter))
    x64, y64 = np.asarray(prob.x_col64), np.asarray(prob.y_col64)
    H1, H1d, _ = poly_basis(x64, 2, (x64.min(), x64.max()))
    H2, H2d, _ = poly_basis(y64, 2, (y64.min(), y64.max()))
    B = np.asarray(p["beta"])
    G = np.asarray(p["U"]) - H1 @ B @ H2.T
    want_dx = Kd1 @ np.linalg.solve(K1, G) + H1d @ B @ H2.T
    want_dy = (Kd2 @ np.linalg.solve(K2, G.T)).T + H1 @ B @ H2d.T
    _, _, _, _, U_dx, U_dy, _ = s_t.lifts(p)
    np.testing.assert_allclose(np.asarray(U_dx), want_dx, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(U_dy), want_dy, rtol=1e-8)


def test_beta_gradient_matches_finite_differences():
    _, s_t, _ = _solvers(N=10)
    p = _rand_params(s_t)
    g = np.asarray(jax.grad(s_t._loss)(p)["beta"])
    h = 1e-6
    for (i, j) in [(0, 0), (1, 2), (2, 1)]:
        pp = jax.tree_util.tree_map(jnp.copy, p)
        pm = jax.tree_util.tree_map(jnp.copy, p)
        pp["beta"] = pp["beta"].at[i, j].add(h)
        pm["beta"] = pm["beta"].at[i, j].add(-h)
        fd = (float(s_t._loss(pp)) - float(s_t._loss(pm))) / (2 * h)
        np.testing.assert_allclose(g[i, j], fd, rtol=5e-4)


def test_short_training_run_is_finite_and_improves():
    _, s_t, _ = _solvers(N=16)
    res = s_t.train(400, verbose=False, mode="chunked")
    errs = np.asarray(res.log["err_list"])
    losses = np.asarray(res.log["loss_list"])
    assert np.isfinite(errs).all() and np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # the objective descends with beta live


def test_profiled_allencahn_rejects_trend():
    # the Gauss-Newton path does not carry the trend; linear residuals do
    prob = make_problem("allencahn_2d-mix-sincos", N_col=12, scale=1.0)
    with pytest.raises(ValueError, match="Gauss-Newton"):
        Solver2D(prob, "Matern52_Cos_1d",
                 dict(CFG, mean_poly=2, u_mode="profiled"),
                 Policy(jnp.float64))


def _joint_quadratic(s, p):
    """The loss as a function of the concatenated (vec V, vec beta) — the
    exact quadratic the joint PCG must minimize (profile_objective='map';
    the marginal objective's extra terms are (V, beta)-independent)."""
    n = s.N1 * s.N2

    def f(z):
        V = z[:n].reshape(s.N1, s.N2)
        b = z[n:].reshape(s.n_beta, s.n_beta)
        return s._loss({**p, "U": V, "beta": b})

    return f, n


@pytest.mark.parametrize("eq,kw", [
    ("poisson_2d-sin_sin", {}),
    ("advection-sin", {"beta": 5.0}),
])
def test_profiled_joint_optimum_is_stationary(eq, kw):
    """(V*, beta*) from the joint PCG is a stationary point of the exact
    joint quadratic, and at least as good as the dense Hessian solve.

    NOTE the (V, beta) SPLIT is deliberately not asserted: at the init
    hyperparameters the trend lies inside the GP span (the mixture carries
    near-zero frequencies), so the split is determined only by the 1e-8
    beta ridge — 18 orders below the Hessian's top eigenvalue, i.e. below
    f64 resolution for ANY solver (the measured dense eigenvalue floor is
    NEGATIVE: -3.6e-7 vs lam_max 1.6e10). The dense np.linalg.solve lands
    at HIGHER loss than the PCG on the Poisson config; only the total U,
    the loss value, and stationarity are well-posed, and once training
    sharpens the mixture onto the solution's spectral lines the split
    direction gains real curvature (the kernel stops supporting the smooth
    trend — exactly the noise-floor mechanism the trend exists to fix)."""
    prob = make_problem(eq, N_col=14, scale=1.0, **kw)
    s = Solver2D(prob, "Matern52_Cos_1d",
                 dict(CFG, mean_poly=2, u_mode="profiled",
                      profile_objective="map", profile_cg_iters=1500),
                 Policy(jnp.float64))
    p = s.init_params()
    f, n = _joint_quadratic(s, p)
    V, beta = s._u_star(p)
    z = jnp.concatenate([V.reshape(-1), beta.reshape(-1)])
    z0 = jnp.zeros_like(z)
    g0 = np.linalg.norm(np.asarray(jax.grad(f)(z0)))
    gz = np.linalg.norm(np.asarray(jax.grad(f)(z)))
    assert gz < 1e-4 * g0, (gz, g0)
    # not worse than the dense pivot (which may itself sit in f64 noise)
    H = jax.hessian(f)(z0)
    zd = jnp.linalg.solve(H, -jax.grad(f)(z0))
    scale = abs(float(f(z0)) - min(float(f(zd)), float(f(z))))
    assert float(f(z)) <= float(f(zd)) + 1e-6 * scale


def test_profiled_joint_matches_dense_when_conditioned():
    """In a regime where the dense augmented solve is trustworthy
    (advection at jitter 1e-3: measured lam_min > 0), the joint PCG
    reproduces it exactly — total U to 1e-6."""
    prob = make_problem("advection-sin", N_col=12, scale=1.0, beta=5.0)
    s = Solver2D(prob, "Matern52_Cos_1d",
                 dict(CFG, jitter=1e-3, llk_weight=20.0, mean_poly=2,
                      u_mode="profiled", profile_objective="map",
                      profile_cg_iters=2000),
                 Policy(jnp.float64))
    p = s.init_params()
    f, n = _joint_quadratic(s, p)
    z0 = jnp.zeros(n + s.n_beta ** 2)
    H = jax.hessian(f)(z0)
    zd = jnp.linalg.solve(H, -jax.grad(f)(z0))
    V, beta = s._u_star(p)
    K1 = s.axis1.gram(s.kernel, p["kernel_paras_1"], jitter=s.jitter)
    K2 = s.axis2.gram(s.kernel, p["kernel_paras_2"], jitter=s.jitter)

    def tot_u(V, b):
        return np.asarray(K1 @ V @ K2 + s._H1 @ b @ s._H2.T)

    U_op = tot_u(V, beta)
    U_d = tot_u(zd[:n].reshape(s.N1, s.N2),
                zd[n:].reshape(s.n_beta, s.n_beta))
    # 1e-4: the solve's relative beta ridge (1e-8 x the block diagonal)
    # shifts the optimum by ~4e-5 here — the designed tie-break bias
    assert np.linalg.norm(U_op - U_d) / np.linalg.norm(U_d) < 1e-4


def test_whitened_trend_loss_matches_adam_total():
    """MAP loss in whitened coordinates (V, beta) == adam-mode loss at the
    total U = K1 V K2 + H1 beta H2' (the trend-augmented change of
    variables is exact)."""
    prob = make_problem("poisson_2d-sin_sin", N_col=14, scale=1.0)
    cfg_t = dict(CFG, mean_poly=2)
    s_w = Solver2D(prob, "Matern52_Cos_1d",
                   dict(cfg_t, u_mode="profiled", profile_objective="map"),
                   Policy(jnp.float64))
    s_a = Solver2D(prob, "Matern52_Cos_1d", cfg_t, Policy(jnp.float64))
    rng = np.random.default_rng(3)
    p = s_w.init_params()
    p["U"] = jnp.asarray(rng.normal(size=(14, 14)) * 0.1)
    p["beta"] = jnp.asarray(rng.normal(size=(3, 3)) * 0.5)
    K1 = s_w.axis1.gram(s_w.kernel, p["kernel_paras_1"], jitter=s_w.jitter)
    K2 = s_w.axis2.gram(s_w.kernel, p["kernel_paras_2"], jitter=s_w.jitter)
    T = jnp.asarray(np.asarray(s_w._H1) @ np.asarray(p["beta"])
                    @ np.asarray(s_w._H2).T)
    p_a = dict(p, U=K1 @ p["U"] @ K2 + T)
    np.testing.assert_allclose(float(s_w._loss(p)), float(s_a._loss(p_a)),
                               rtol=1e-9)


def test_profiled_trend_short_run_descends():
    """The marginal objective must descend with the trend in the joint
    solve. (rel-L2 is NOT asserted: at raw init hyperparameters the 2D
    profiled conditional optimum interpolates wildly — measured err 763
    with NO trend, 346 with it at this config — and 120 epochs cannot
    leave that regime; the hyperparameter ascent, not the trend, owns
    that. The loss is the quantity the step is guaranteed to improve.)"""
    prob = make_problem("poisson_2d-sin_sin", N_col=16, scale=1.0)
    s = Solver2D(prob, "Matern52_Cos_1d",
                 dict(CFG, mean_poly=2, u_mode="profiled",
                      profile_cg_iters=120),
                 Policy(jnp.float64))
    res = s.train(120, verbose=False, mode="chunked", n_evals=4)
    losses = np.asarray(res.log["loss_list"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_advection_spectral_init_reads_boundary_edges():
    """Advection's source is identically zero (beta u_x + u_y = 0), so the
    spectral init falls back to the boundary EDGES, which carry each axis's
    spectrum: for u = sin(x - beta y) the y edge holds the beta-scaled line
    at beta/2pi cycles/unit (reference operator:
    code/model_GP_solver_advection.py:354-362)."""
    prob = make_problem("advection-sin", N_col=200, scale=1.0, beta=200.0)
    s = Solver2D(prob, "Matern52_Cos_1d",
                 dict(CFG, llk_weight=500.0, freq_scale=40.0,
                      freq_init="spectral"),
                 Policy(jnp.float64))
    p = s.init_params()
    f2 = np.asarray(p["kernel_paras_2"]["freq"])
    line = 200.0 / (2 * np.pi)
    assert np.min(np.abs(f2 - line)) < 0.3, f2
    # linspace init, by contrast, has nothing within half a coverage step
    s_lin = Solver2D(prob, "Matern52_Cos_1d",
                     dict(CFG, llk_weight=500.0, freq_scale=40.0),
                     Policy(jnp.float64))
    f2_lin = np.asarray(s_lin.init_params()["kernel_paras_2"]["freq"])
    assert np.min(np.abs(f2_lin - line)) > 0.5
