"""Direct numerical parity against the reference implementation.

Runs the ORIGINAL reference solvers (mounted read-only at /root/reference,
pure JAX) side by side with ours for several optimization steps and requires
loss trajectories to agree to ~1e-12 relative. Skipped when the reference
tree is not present.

The reference targets JAX 0.4.8, so two import shims are installed:
``jax.config`` (removed from modern JAX) and ``fire`` (not in this image).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/code"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    import jax

    shim = types.ModuleType("jax.config")
    shim.config = jax.config
    sys.modules.setdefault("jax.config", shim)
    fire = types.ModuleType("fire")
    fire.Fire = lambda *a, **k: None
    sys.modules.setdefault("fire", fire)
    sys.path.insert(0, REF)
    import importlib

    km = importlib.import_module("kernel_matrix")
    # The reference has a circular import knot (utils imports the model
    # modules and vice versa, SURVEY §1) that only resolves when utils is
    # imported before model_GP_solver_1d.
    importlib.import_module("utils")
    m1 = importlib.import_module("model_GP_solver_1d")
    madv = importlib.import_module("model_GP_solver_advection")
    return km, m1, madv


def mixture_params(Q, fs):
    return {"log-w": np.log(1 / Q) * np.ones(Q), "log-ls": np.zeros(Q),
            "freq": np.linspace(0, 1, Q) * fs}


def run_steps(step, params, opt_state, n, with_key):
    import jax

    key = jax.random.PRNGKey(109)
    losses = []
    for _ in range(n):
        if with_key:
            key, sk = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sk)
        else:
            params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    return losses


def test_1d_step_trajectory_matches_reference(ref_modules):
    km, m1, _ = ref_modules
    import jax
    import jax.numpy as jnp

    from gphm_tpu.models.base import make_step_fn
    from gphm_tpu.models.solver_1d import Solver1D
    from gphm_tpu.precision import Policy
    from gphm_tpu.problems.equations import make_problem

    N, Q, fs = 40, 5, 20.0
    scale = 2 * np.pi
    u = lambda x: jnp.sin(100 * x)  # noqa: E731
    X_col = np.linspace(0, 1, N).reshape(-1, 1) * scale
    Xind = np.array([0, N - 1])
    y = jnp.array([u(X_col[0]), u(X_col[-1])]).reshape(-1)
    src = m1.get_source_val(u, X_col.reshape(-1), "poisson_1d")
    X_test = np.linspace(0, 1, 50).reshape(-1, 1) * scale

    trick = dict(equation="poisson_1d-single_sin", kernel=km.Matern52_Cos_1d,
                 lr=0.01, llk_weight=200, Q=Q, freq_scale=fs, logdet=True,
                 tol=-1, nepoch=100, num_fold=1)
    ref = m1.GP_solver_1d_single(Xind, y, X_col, src, 1e-6, X_test,
                                 u(X_test), trick)
    rparams = {"log_tau": 0.0, "log_v": 0.0,
               "kernel_paras": mixture_params(Q, fs),
               "u": np.zeros((N, 1))}
    ropt = ref.optimizer.init(rparams)
    ref_losses = run_steps(ref.step, rparams, ropt, 5, with_key=True)

    prob = make_problem("poisson_1d-single_sin", N_col=N, scale=scale, M=50)
    cfg = dict(Q=Q, lr=0.01, llk_weight=200, logdet=True, tol=-1,
               freq_scale=fs, jitter=1e-6)
    s = Solver1D(prob, "Matern52_Cos_1d", cfg,
                 Policy(dtype=jnp.float64, max_jitter_tries=0))
    sp = s.init_params()
    so = s.optimizer.init(sp)
    step = jax.jit(make_step_fn(s._loss, s.optimizer))
    our_losses = run_steps(step, sp, so, 5, with_key=False)

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-11)


def test_advection_step_trajectory_matches_reference(ref_modules):
    km, _, madv = ref_modules
    import jax
    import jax.numpy as jnp

    from gphm_tpu.models.base import make_step_fn
    from gphm_tpu.models.solver_2d import Solver2D
    from gphm_tpu.precision import Policy
    from gphm_tpu.problems.equations import make_problem

    beta, N, Q, fs = 200.0, 24, 5, 40.0
    u = lambda x, y: jnp.sin(x - beta * y)  # noqa: E731
    x_pos, y_pos, u_mh = madv.get_mesh_data(u, N, N, 1.0)
    bvals = madv.get_boundary_vals(u_mh)
    src = np.asarray(madv.get_source_val(u, x_pos, y_pos, "advection",
                                         beta)).reshape(N, N)
    xt, yt, ute = madv.get_mesh_data(u, 50, 50, 1.0)
    trick = dict(equation="advection-sin", kernel=km.Matern52_Cos_1d,
                 lr=0.01, llk_weight=500, Q=Q, freq_scale=fs, logdet=True,
                 tol=-1, nepoch=100, num_fold=1, beta=beta)
    ref = madv.GP_solver_2d_single_advection(
        bvals, (x_pos, y_pos), src, 1e-6, (xt, yt), ute, trick)
    rparams = {"log_tau": 0.0, "log_v": 0.0,
               "kernel_paras_1": mixture_params(Q, fs),
               "kernel_paras_2": mixture_params(Q, fs),
               "U": np.zeros((N, N))}
    ropt = ref.optimizer.init(rparams)
    ref_losses = run_steps(ref.step, rparams, ropt, 5, with_key=True)

    prob = make_problem("advection-sin", N_col=N, scale=1.0, beta=beta, M=50)
    cfg = dict(Q=Q, lr=0.01, llk_weight=500, logdet=True, tol=-1,
               freq_scale=fs, jitter=1e-6)
    s = Solver2D(prob, "Matern52_Cos_1d", cfg,
                 Policy(dtype=jnp.float64, max_jitter_tries=0))
    sp = s.init_params()
    so = s.optimizer.init(sp)
    step = jax.jit(make_step_fn(s._loss, s.optimizer))
    our_losses = run_steps(step, sp, so, 5, with_key=False)

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-11)


def test_2d_step_trajectory_matches_reference(ref_modules):
    km, _, _ = ref_modules
    import importlib

    m2 = importlib.import_module("model_GP_solver_2d")
    import jax
    import jax.numpy as jnp

    from gphm_tpu.models.base import make_step_fn
    from gphm_tpu.models.solver_2d import Solver2D
    from gphm_tpu.precision import Policy
    from gphm_tpu.problems.equations import make_problem

    N, Q, fs = 20, 4, 20.0
    scale = 2 * np.pi
    u = lambda x, y: jnp.sin(100 * x) * jnp.sin(100 * y)  # noqa: E731
    x_pos, y_pos, u_mh = m2.get_mesh_data(u, N, N, scale)
    bvals = m2.get_boundary_vals(u_mh)
    src = np.asarray(m2.get_source_val(u, x_pos, y_pos,
                                       "poisson_2d")).reshape(N, N)
    xt, yt, ute = m2.get_mesh_data(u, 40, 40, scale)
    trick = dict(equation="poisson_2d-sin_sin", kernel=km.Matern52_Cos_1d,
                 lr=0.01, llk_weight=200, Q=Q, freq_scale=fs, logdet=True,
                 tol=-1, nepoch=100, num_fold=1)
    ref = m2.GP_solver_2d_single(bvals, (x_pos, y_pos), src, 1e-6,
                                 (xt, yt), ute, trick)
    rparams = {"log_tau": 0.0, "log_v": 0.0,
               "kernel_paras_1": mixture_params(Q, fs),
               "kernel_paras_2": mixture_params(Q, fs),
               "U": np.zeros((N, N))}
    ropt = ref.optimizer.init(rparams)
    ref_losses = run_steps(ref.step, rparams, ropt, 5, with_key=True)

    prob = make_problem("poisson_2d-sin_sin", N_col=N, scale=scale, M=40)
    cfg = dict(Q=Q, lr=0.01, llk_weight=200, logdet=True, tol=-1,
               freq_scale=fs, jitter=1e-6)
    s = Solver2D(prob, "Matern52_Cos_1d", cfg,
                 Policy(dtype=jnp.float64, max_jitter_tries=0))
    sp = s.init_params()
    so = s.optimizer.init(sp)
    step = jax.jit(make_step_fn(s._loss, s.optimizer))
    our_losses = run_steps(step, sp, so, 5, with_key=False)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-11)


def test_extra_solver_phase_switch_matches_reference(ref_modules):
    """The two-GP solver across its change point: train the reference
    GP_solver_1d_extra through the phase switch and compare the full loss
    trajectory (phase-1 mixture steps AND phase-2 extra-GP steps)."""
    km, m1, _ = ref_modules
    import copy as _copy
    import importlib

    mx = importlib.import_module("model_GP_solver_1d_extra")
    import jax
    import jax.numpy as jnp

    from gphm_tpu.models.extra import Solver1DExtra
    from gphm_tpu.precision import Policy
    from gphm_tpu.problems.equations import make_problem

    N, Q, fs = 40, 4, 30.0
    u = lambda x: jnp.sin(x) + 0.1 * jnp.sin(20 * x) \
        + 0.05 * jnp.sin(100 * x)  # noqa: E731
    X_col = np.linspace(0, 1, N).reshape(-1, 1)
    Xind = np.array([0, N - 1])
    y = jnp.array([u(X_col[0]), u(X_col[-1])]).reshape(-1)
    src = m1.get_source_val(u, X_col.reshape(-1), "poisson_1d")
    X_test = np.linspace(0, 1, 50).reshape(-1, 1)

    trick = dict(equation="poisson_1d-mix_sin", kernel=km.Matern52_Cos_1d,
                 kernel_extra=km.Matern52_1d, lr=0.01, llk_weight=200, Q=Q,
                 freq_scale=fs, logdet=True, tol=-1, nepoch=10, num_fold=1,
                 change_point=0.4)
    ref = mx.GP_solver_1d_extra(Xind, y, X_col, src, 1e-6, X_test,
                                u(X_test), trick)
    # replicate the reference train loop manually (phase switch at i == 4)
    rparams = {"log_tau": 0.0, "log_v": 0.0,
               "kernel_paras": mixture_params(Q, fs),
               "u": np.zeros((N, 1))}
    ropt = ref.optimizer.init(rparams)
    key = jax.random.PRNGKey(109)
    cp = 4
    ref_losses = []
    rextra = roe = None
    for i in range(10):
        key, sk = jax.random.split(key)
        if i <= cp:
            rparams, ropt, loss = ref.step(rparams, ropt, sk)
        else:
            rextra, roe, loss = ref.step_extra(rextra, roe, sk)
        if i == cp:
            ref.params = _copy.deepcopy(rparams)
            rextra = {"log_tau": _copy.deepcopy(rparams["log_tau"]),
                      "log_v": 0.0,
                      "kernel_paras": {"log-w": np.zeros(1),
                                       "log-ls": np.zeros(1)},
                      "u": np.zeros((N, 1))}
            roe = ref.optimizer_extra.init(rextra)
        ref_losses.append(float(loss))

    prob = make_problem("poisson_1d-mix_sin", N_col=N, scale=1.0, M=50)
    cfg = dict(Q=Q, lr=0.01, llk_weight=200, logdet=True, tol=-1,
               freq_scale=fs, jitter=1e-6, change_point=0.4)
    s = Solver1DExtra(prob, "Matern52_Cos_1d", cfg,
                      Policy(dtype=jnp.float64, max_jitter_tries=0))
    res = s.train(nepoch=10, verbose=False)
    # chunked_train evaluates after every epoch at nepoch=10 (reference
    # float-mod cadence) and stores log(loss) when loss > 1 — undo that
    # reference logging quirk before comparing raw losses
    ours = [np.exp(v) if v > 1 else v for v in res.log["loss_list"]]
    np.testing.assert_allclose(ours, ref_losses, rtol=1e-8)
