"""Solver golden tests: the jitted losses must match a straightforward dense
NumPy transcription of the published MAP objective
(reference formulas: code/model_GP_solver_1d.py:123-149,
code/model_GP_solver_2d.py:145-174, code/model_GP_solver_advection.py:141-170,
code/model_GP_solver_1d_extra.py:106-141), and short training runs must reduce
the manufactured-solution error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.models.base import eval_epochs
from gphm_tpu.models.extra import Solver1DExtra
from gphm_tpu.models.solver_1d import Solver1D
from gphm_tpu.models.solver_2d import Solver2D
from gphm_tpu.ops.kernels import get_kernel
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem

POLICY = Policy(dtype=jnp.float64, max_jitter_tries=0)

CFG = dict(Q=5, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
           freq_scale=20.0, jitter=1e-6)


def rand_params_1d(N, Q=5, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "log_tau": jnp.asarray(rng.normal() * 0.1),
        "log_v": jnp.asarray(rng.normal() * 0.1),
        "kernel_paras": {
            "log-w": jnp.asarray(rng.normal(size=Q) * 0.2 - np.log(Q)),
            "log-ls": jnp.asarray(rng.normal(size=Q) * 0.2),
            "freq": jnp.asarray(np.linspace(0, 1, Q) * 20.0),
        },
        "u": jnp.asarray(rng.normal(size=(N, 1)) * 0.1),
    }


def np_gram(kernel, pts1, pts2, p, deriv=0):
    t = jnp.asarray(pts1)[:, None] - jnp.asarray(pts2)[None, :]
    return np.asarray(kernel.deriv(deriv)(t, p))


def np_loss_1d(solver, params, kernel):
    """Dense NumPy transcription of the 1D objective."""
    X = np.asarray(solver.X_col)
    p = params["kernel_paras"]
    K = np_gram(kernel, X, X, p) + 1e-6 * np.eye(len(X))
    u = np.asarray(params["u"])
    Kinv_u = np.linalg.solve(K, u)
    u_xx = np_gram(kernel, X, X, p, 2) @ Kinv_u

    bg = np.sum((u[np.asarray(solver.bc_idx)].reshape(-1)
                 - np.asarray(solver.bc_vals)) ** 2)
    if solver.eq_type == "poisson_1d":
        res = u_xx - np.asarray(solver.src)
    else:
        res = u_xx + u * (u ** 2 - 1) - np.asarray(solver.src)
    eg = np.sum(res ** 2)

    log_tau, log_v = float(params["log_tau"]), float(params["log_v"])
    lp = -0.5 * np.linalg.slogdet(K)[1] - 0.5 * np.sum(u * Kinv_u)
    lb = 0.5 * solver.N_b * log_tau - 0.5 * np.exp(log_tau) * bg
    le = 0.5 * solver.N_col * log_v - 0.5 * np.exp(log_v) * eg
    return -(lp + lb * solver.llk_weight + le)


@pytest.mark.parametrize("equation,kname", [
    ("poisson_1d-single_sin", "Matern52_Cos_1d"),
    ("poisson_1d-single_sin", "SE_Cos_1d"),
    ("allencahn_1d-sin_cos", "Matern52_Cos_1d"),
])
def test_loss_1d_golden(equation, kname):
    prob = make_problem(equation, N_col=40, scale=2 * np.pi)
    solver = Solver1D(prob, kname, CFG, POLICY)
    params = rand_params_1d(40)
    ours = float(solver.loss(params))
    ref = float(np_loss_1d(solver, params, get_kernel(kname)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def rand_params_2d(N1, N2, Q=5, seed=0):
    rng = np.random.default_rng(seed)

    def kp(s):
        return {
            "log-w": jnp.asarray(rng.normal(size=Q) * 0.2 - np.log(Q)),
            "log-ls": jnp.asarray(rng.normal(size=Q) * 0.2),
            "freq": jnp.asarray(np.linspace(0, 1, Q) * 20.0),
        }

    return {
        "log_tau": jnp.asarray(rng.normal() * 0.1),
        "log_v": jnp.asarray(rng.normal() * 0.1),
        "kernel_paras_1": kp(1),
        "kernel_paras_2": kp(2),
        "U": jnp.asarray(rng.normal(size=(N1, N2)) * 0.1),
    }


def np_loss_2d(solver, params, kernel):
    """Dense NumPy transcription of the Kronecker 2D objective."""
    x, y = np.asarray(solver.x_col), np.asarray(solver.y_col)
    p1, p2 = params["kernel_paras_1"], params["kernel_paras_2"]
    K1 = np_gram(kernel, x, x, p1) + 1e-6 * np.eye(len(x))
    K2 = np_gram(kernel, y, y, p2) + 1e-6 * np.eye(len(y))
    U = np.asarray(params["U"])
    K1inv_U = np.linalg.solve(K1, U)
    K2inv_Ut = np.linalg.solve(K2, U.T)
    d = solver.deriv_order
    U_dx = np_gram(kernel, x, x, p1, d) @ K1inv_U
    U_dy = (np_gram(kernel, y, y, p2, d) @ K2inv_Ut).T

    ub = np.hstack((U[0, :], U[-1, :], U[:, 0], U[:, -1]))
    bg = np.sum((ub - np.asarray(solver.bc_vals)) ** 2)
    src = np.asarray(solver.src)
    if solver.eq_type == "poisson_2d":
        res = U_dx + U_dy - src
    elif solver.eq_type == "allencahn_2d":
        res = U_dx + U_dy + U * (U ** 2 - 1) - src
    else:
        res = solver.beta * U_dx + U_dy - src
    eg = np.sum(res ** 2)

    log_tau, log_v = float(params["log_tau"]), float(params["log_v"])
    lp = -0.5 * solver.N2 * np.linalg.slogdet(K1)[1] \
        - 0.5 * solver.N1 * np.linalg.slogdet(K2)[1] \
        - 0.5 * np.sum(K1inv_U * K2inv_Ut.T)
    lb = 0.5 * solver.Nb * log_tau - 0.5 * np.exp(log_tau) * bg
    le = 0.5 * solver.Nc * log_v - 0.5 * np.exp(log_v) * eg
    return -(lp + lb * solver.llk_weight + le)


@pytest.mark.parametrize("equation,beta", [
    ("poisson_2d-sin_sin", 0.0),
    ("allencahn_2d-mix-sincos", 0.0),
    ("advection-sin", 20.0),
])
def test_loss_2d_golden(equation, beta):
    prob = make_problem(equation, N_col=24, scale=1.0, beta=beta)
    solver = Solver2D(prob, "Matern52_Cos_1d", CFG, POLICY)
    params = rand_params_2d(24, 24)
    ours = float(solver.loss(params))
    ref = float(np_loss_2d(solver, params, get_kernel("Matern52_Cos_1d")))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_loss_extra_golden():
    prob = make_problem("poisson_1d-mix_sin", N_col=40, scale=1.0)
    cfg = dict(CFG, change_point=0.5)
    solver = Solver1DExtra(prob, "Matern52_Cos_1d", cfg, POLICY)
    base = rand_params_1d(40, seed=1)

    F = solver._factor(base["kernel_paras"])
    alpha = F.solve(base["u"])
    u_xx_base = solver._u_xx(base["kernel_paras"], alpha)
    loss_extra = jax.jit(solver.make_loss_extra(base["u"], u_xx_base))

    rng = np.random.default_rng(3)
    pe = {
        "log_tau": jnp.asarray(0.1), "log_v": jnp.asarray(-0.2),
        "kernel_paras": {"log-w": jnp.asarray(rng.normal(size=1)),
                         "log-ls": jnp.asarray(rng.normal(size=1))},
        "u": jnp.asarray(rng.normal(size=(40, 1)) * 0.1),
    }

    # independent dense computation
    X = np.asarray(solver.X_col)
    km = get_kernel("Matern52_1d")
    Ke = np_gram(km, X, X, pe["kernel_paras"]) + 1e-6 * np.eye(40)
    ue = np.asarray(pe["u"])
    Kinv_ue = np.linalg.solve(Ke, ue)
    u_xx_e = np_gram(km, X, X, pe["kernel_paras"], 2) @ Kinv_ue

    ub = np.asarray(base["u"])
    bg = np.sum((ub[np.asarray(solver.bc_idx)].reshape(-1)
                 + ue[np.asarray(solver.bc_idx)].reshape(-1)
                 - np.asarray(solver.bc_vals)) ** 2)
    res = np.asarray(u_xx_base) + u_xx_e - np.asarray(solver.src)
    eg = np.sum(res ** 2)
    lp = -0.5 * np.linalg.slogdet(Ke)[1] - 0.5 * np.sum(ue * Kinv_ue)
    lb = 0.5 * solver.N_b * 0.1 - 0.5 * np.exp(0.1) * bg
    le = 0.5 * solver.N_col * (-0.2) - 0.5 * np.exp(-0.2) * eg
    ref = -(lp + lb * solver.llk_weight + le)

    np.testing.assert_allclose(float(loss_extra(pe)), ref, rtol=1e-6)


# ---------------------------------------------------------------------------
# training behaviour
# ---------------------------------------------------------------------------

def test_eval_epochs_cadence():
    assert eval_epochs(100) == [0, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50,
                                55, 60, 65, 70, 75, 80, 85, 90, 95]
    assert len(eval_epochs(100000)) == 20
    assert eval_epochs(10) == list(range(10))  # period 0.5 -> every epoch
    # non-integer period: the reference's float modulo would match only
    # i=0 (e.g. 20000/150 = 133.33...); the cadence must still spread
    # n_evals points over the budget
    ee = eval_epochs(20000, 150)
    assert len(ee) == 150 and ee[0] == 0 and ee[-1] >= 19800
    assert all(100 <= b - a <= 167 for a, b in zip(ee, ee[1:]))


def test_train_1d_smoke_error_decreases():
    prob = make_problem("poisson_1d-single_sin", N_col=60, scale=2 * np.pi)
    cfg = dict(CFG, Q=10)
    solver = Solver1D(prob, "Matern52_Cos_1d", cfg, POLICY)
    res = solver.train(nepoch=200, verbose=False)
    assert res.min_err < 1.0
    assert res.log["err_list"][-1] <= res.log["err_list"][0] + 1e-6
    assert len(res.log["err_list"]) == 20
    assert len(res.log["w_list"]) == 20


def test_train_2d_smoke():
    prob = make_problem("poisson_2d-sin_sin", N_col=24, scale=2 * np.pi)
    solver = Solver2D(prob, "Matern52_Cos_1d", CFG, POLICY)
    res = solver.train(nepoch=100, verbose=False)
    assert np.isfinite(res.min_err)
    # 24 points cannot resolve the 100-frequency target; just require the
    # optimizer to have found something no worse than the zero-init error
    assert res.min_err <= res.log["err_list"][0] + 1e-9
    assert len(res.log["err_list"]) == 20


def test_train_advection_smoke():
    prob = make_problem("advection-sin", N_col=20, scale=1.0, beta=5.0)
    cfg = dict(CFG, llk_weight=500.0)
    solver = Solver2D(prob, "Matern52_Cos_1d", cfg, POLICY)
    res = solver.train(nepoch=60, verbose=False)
    assert np.isfinite(res.min_err)


def test_train_extra_two_phase():
    prob = make_problem("poisson_1d-mix_sin", N_col=50, scale=1.0)
    # early change point so the phase switch happens before the
    # error-increase early stop can fire on this tiny problem
    cfg = dict(CFG, Q=8, change_point=0.1, freq_scale=30.0)
    solver = Solver1DExtra(prob, "Matern52_Cos_1d", cfg, POLICY)
    res = solver.train(nepoch=100, verbose=False)
    assert np.isfinite(res.min_err)
    assert res.extras["base_params"] is not None
    # phase-2 params have the single-component Matern kernel shape
    assert res.params["kernel_paras"]["log-w"].shape == (1,)


def test_early_stop_tol_2d():
    prob = make_problem("poisson_2d-sin_sin", N_col=16, scale=2 * np.pi)
    cfg = dict(CFG, tol=1e12)  # absurdly high tol -> stop at first check
    solver = Solver2D(prob, "Matern52_Cos_1d", cfg, POLICY)
    res = solver.train(nepoch=100, verbose=False)
    assert res.early_stopping["flag"]
    assert res.early_stopping["epoch"] == 0
