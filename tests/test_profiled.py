"""Profiled-latent (u_mode='profiled') mode: closed-form u*(theta).

For linear residuals the MAP objective is quadratic in u; each step writes
u* = argmin_u L(u, theta) (one SPD solve, S = K + w tau K diag(m) K
+ v Kd Kd) and descends only on the hyperparameters with the
envelope-theorem gradient. Checks: optimality of u*, exactness of the
envelope gradient vs finite differences, iteration-efficiency vs the
reference Adam-u protocol, the noise-precision clip, and product-surface
integration (run_experiment, two-GP phase 2, multi-start composition).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.models.extra import Solver1DExtra
from gphm_tpu.models.solver_1d import Solver1D
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem

POLICY = Policy(dtype=jnp.float64, max_jitter_tries=0)
CFG = dict(Q=8, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
           freq_scale=20.0, jitter=1e-6, u_mode="profiled")


def make_solver(N=48, **kw):
    prob = make_problem("poisson_1d-single_sin", N_col=N, scale=2 * np.pi)
    return Solver1D(prob, "Matern52_Cos_1d", dict(CFG, **kw), POLICY)


def moderate_params(solver):
    """Hyperparameters away from the wild-conditioning init corner."""
    p = solver.init_params()
    p["log_tau"] = jnp.asarray(3.0)
    p["log_v"] = jnp.asarray(1.0)
    return p


def test_u_star_is_conditional_optimum():
    solver = make_solver()
    p = moderate_params(solver)
    u = solver._u_star(p)
    g = jax.grad(solver._loss)(dict(p, u=u))["u"]
    # compare against the gradient scale at a generic latent
    g0 = jax.grad(solver._loss)(dict(p, u=jnp.zeros_like(u)))["u"]
    assert float(jnp.linalg.norm(g)) < 1e-6 * float(jnp.linalg.norm(g0))
    # and perturbing u away from u* strictly increases the loss
    l_star = float(solver._loss(dict(p, u=u)))
    rng = np.random.default_rng(0)
    for _ in range(3):
        du = jnp.asarray(rng.normal(size=u.shape)) * 1e-3
        assert float(solver._loss(dict(p, u=u + du))) > l_star


def test_envelope_gradient_matches_finite_differences():
    solver = make_solver(32)
    p = moderate_params(solver)

    def profiled_loss(params):
        u = jax.lax.stop_gradient(solver._u_star(params))
        return solver._loss(dict(params, u=u))

    # The envelope gradient is exact at the exact minimizer; the stabilizing
    # ridge in _u_star makes u* the optimum of a slightly perturbed
    # quadratic, so FD (which differentiates *through* the ridged u*) and
    # the envelope gradient agree to ~the ridge's relative perturbation.
    g = jax.grad(profiled_loss)(p)
    for key in ("log_tau", "log_v"):
        eps = 1e-5
        pp = {**p, key: p[key] + eps}
        pm = {**p, key: p[key] - eps}
        fd = (float(profiled_loss(pp)) - float(profiled_loss(pm))) / (2 * eps)
        np.testing.assert_allclose(float(g[key]), fd, rtol=1e-2)
    # one mixture-frequency component
    eps = 1e-5
    for j in (1, 4):
        fp = p["kernel_paras"]["freq"].at[j].add(eps)
        fm = p["kernel_paras"]["freq"].at[j].add(-eps)
        fd = (float(profiled_loss({**p, "kernel_paras":
                                   {**p["kernel_paras"], "freq": fp}}))
              - float(profiled_loss({**p, "kernel_paras":
                                     {**p["kernel_paras"], "freq": fm}}))) \
            / (2 * eps)
        np.testing.assert_allclose(float(g["kernel_paras"]["freq"][j]), fd,
                                   rtol=1e-2, atol=1e-8)


def test_profiled_converges_much_faster_than_adam_u():
    n = 400
    prof = make_solver(64, Q=12).train(n, verbose=False, mode="chunked")
    adam = make_solver(64, Q=12, u_mode="adam").train(
        n, verbose=False, mode="chunked")
    # the criterion (training-data gap) collapses orders of magnitude faster
    assert prof.log["err_list"][-1] < 0.5
    assert prof.log["err_list"][-1] < 0.2 * adam.log["err_list"][-1]


def test_noise_clip_is_enforced():
    solver = make_solver(32, profile_clip=2.0)
    p = solver.init_params()
    p["log_tau"] = jnp.asarray(10.0)
    p["log_v"] = jnp.asarray(-7.0)
    out = solver._prepare_step(p)
    assert float(out["log_tau"]) == 2.0 and float(out["log_v"]) == -2.0


def test_profiled_rejects_nonlinear_residual():
    prob = make_problem("allencahn_1d-single_sin", N_col=32,
                        scale=2 * np.pi)
    with pytest.raises(ValueError, match="linear"):
        Solver1D(prob, "Matern52_Cos_1d", CFG, POLICY)


def test_fused_and_chunked_profiled_agree():
    res_c = make_solver(32).train(100, verbose=False, mode="chunked")
    res_f = make_solver(32).train(100, verbose=False, mode="fused")
    np.testing.assert_allclose(res_f.log["err_list"],
                               res_c.log["err_list"], rtol=1e-8)


def test_extra_two_gp_profiled_phase2_runs_and_improves():
    prob = make_problem("poisson_1d-single_sin", N_col=48, scale=2 * np.pi)
    solver = Solver1DExtra(prob, "Matern52_Cos_1d",
                           dict(CFG, change_point=0.5), POLICY)
    res = solver.train(200, verbose=False)
    assert np.isfinite(res.min_err)
    assert res.extras["base_params"] is not None
    # phase-2 u_extra at its conditional optimum: tiny latent gradient.
    # res.params carries u*(theta) from one theta-update earlier, so
    # refresh the latent at the final hyperparameters first.
    base = res.extras["base_params"]
    F = solver._factor(base["kernel_paras"])
    alpha = F.solve(base["u"])
    loss_extra = solver.make_loss_extra(
        base["u"], solver._u_xx(base["kernel_paras"], alpha))
    fresh = solver._prepare_extra(res.params)
    g = jax.grad(loss_extra)(fresh)["u"]
    g0 = jax.grad(loss_extra)(
        {**fresh, "u": jnp.zeros_like(fresh["u"])})["u"]
    assert float(jnp.linalg.norm(g)) < 1e-5 * float(jnp.linalg.norm(g0))


def test_run_experiment_profiled_product_surface(tmp_path):
    from gphm_tpu.experiment import run_experiment
    from gphm_tpu.utils.config import load_config

    res = run_experiment(
        load_config("poisson_1d-single_sin", N_col=32, nepoch=60, Q=8,
                    dtype="float64", u_mode="profiled"),
        out_base=str(tmp_path), verbose=False, figures=False)
    assert np.isfinite(res.err_mean)


def test_profiled_composes_with_multi_start(tmp_path):
    from gphm_tpu.experiment import run_experiment
    from gphm_tpu.utils.config import load_config

    res = run_experiment(
        load_config("poisson_1d-single_sin", N_col=32, nepoch=60, Q=8,
                    dtype="float64", u_mode="profiled", multi_start=2,
                    multi_start_frac=0.25),
        out_base=None, verbose=False, figures=False)
    assert np.isfinite(res.err_mean)
