"""Toeplitz fast-path Gram construction vs the dense path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.models.solver_1d import Solver1D
from gphm_tpu.models.solver_2d import Solver2D
from gphm_tpu.ops.gram import (gram, toeplitz_gram, toeplitz_lags,
                               uniform_spacing)
from gphm_tpu.ops.kernels import get_kernel
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem

POLICY = Policy(dtype=jnp.float64, max_jitter_tries=0)
CFG = dict(Q=5, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
           freq_scale=20.0, jitter=1e-6)


def params_for(Q=5, seed=0):
    rng = np.random.default_rng(seed)
    return {"log-w": jnp.asarray(rng.normal(size=Q) * 0.3 - np.log(Q)),
            "log-ls": jnp.asarray(rng.normal(size=Q) * 0.3),
            "freq": jnp.asarray(np.linspace(0, 1, Q) * 15.0)}


def test_uniform_spacing_detection():
    assert uniform_spacing(np.linspace(0, 1, 50)) is not None
    assert uniform_spacing(np.linspace(0, 2 * np.pi, 400)) is not None
    x = np.linspace(0, 1, 50) ** 2
    assert uniform_spacing(x) is None
    assert uniform_spacing(np.array([1.0])) is None


@pytest.mark.parametrize("kname", ["SE_Cos_1d", "Matern52_Cos_1d",
                                   "Matern52_1d", "SE_1d"])
@pytest.mark.parametrize("deriv", [0, 1, 2])
def test_toeplitz_matches_dense(kname, deriv):
    k = get_kernel(kname)
    p = params_for()
    x = jnp.asarray(np.linspace(0, 2 * np.pi, 57))
    h = uniform_spacing(x)
    lags, idx = toeplitz_lags(57, h, jnp.float64)
    Kt = toeplitz_gram(k, lags, idx, p, deriv=deriv, jitter=1e-6)
    Kd = gram(k, x, p, deriv=deriv, jitter=1e-6)
    np.testing.assert_allclose(np.asarray(Kt), np.asarray(Kd),
                               rtol=1e-12, atol=1e-12)


def test_solver_1d_toeplitz_equals_dense_loss_and_grad():
    prob = make_problem("poisson_1d-single_sin", N_col=48, scale=2 * np.pi)
    st = Solver1D(prob, "Matern52_Cos_1d", CFG, POLICY)
    sd = Solver1D(prob, "Matern52_Cos_1d", dict(CFG, toeplitz=False), POLICY)
    assert st.toeplitz and not sd.toeplitz

    params = st.init_params()
    params["u"] = jnp.asarray(
        np.random.default_rng(0).normal(size=params["u"].shape) * 0.1)
    np.testing.assert_allclose(float(st.loss(params)),
                               float(sd.loss(params)), rtol=1e-12)
    g1 = jax.grad(st._loss)(params)
    g2 = jax.grad(sd._loss)(params)
    for k in ("log-w", "log-ls", "freq"):
        np.testing.assert_allclose(np.asarray(g1["kernel_paras"][k]),
                                   np.asarray(g2["kernel_paras"][k]),
                                   rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(g1["u"]), np.asarray(g2["u"]),
                               rtol=1e-9, atol=1e-9)


def test_solver_2d_toeplitz_equals_dense_loss():
    prob = make_problem("poisson_2d-sin_sin", N_col=20, scale=2 * np.pi)
    st = Solver2D(prob, "Matern52_Cos_1d", CFG, POLICY)
    sd = Solver2D(prob, "Matern52_Cos_1d", dict(CFG, toeplitz=False), POLICY)
    assert st.toeplitz and not sd.toeplitz
    params = st.init_params()
    params["U"] = jnp.asarray(
        np.random.default_rng(1).normal(size=params["U"].shape) * 0.1)
    np.testing.assert_allclose(float(st.loss(params)),
                               float(sd.loss(params)), rtol=1e-12)


def test_toeplitz_active_in_float32():
    """Regression: f32-cast linspace grids must still take the fast path
    (detection runs on the problem's authoritative f64 grid; a plain f32
    grid is covered by the dtype-aware tolerance)."""
    for eq, ctor in [("poisson_1d-single_sin", Solver1D),
                     ("poisson_2d-sin_sin", Solver2D)]:
        prob = make_problem(eq, N_col=400, scale=2 * np.pi,
                            dtype=jnp.float32)
        s = ctor(prob, "Matern52_Cos_1d", CFG, Policy(dtype=jnp.float32))
        assert s.toeplitz, f"Toeplitz fast path dead in f32 for {eq}"
    # fallback: raw f32 grid without the f64 sidecar
    x32 = (np.linspace(0, 2 * np.pi, 400)).astype(np.float32)
    assert uniform_spacing(x32) is not None
    assert uniform_spacing((np.linspace(0, 1, 50) ** 2).astype(np.float32)) \
        is None


def test_policy_activate_sets_matmul_precision():
    """The documented accuracy safeguard must actually be applied by solver
    construction (advisor finding: declared but never installed)."""
    prob = make_problem("poisson_1d-single_sin", N_col=16, scale=2 * np.pi,
                        dtype=jnp.float32)
    Solver1D(prob, "Matern52_Cos_1d", CFG, Policy(dtype=jnp.float32))
    assert jax.config.jax_default_matmul_precision == "highest"


def test_extra_solver_toeplitz_smoke():
    from gphm_tpu.models.extra import Solver1DExtra
    prob = make_problem("poisson_1d-mix_sin", N_col=40, scale=1.0)
    s = Solver1DExtra(prob, "Matern52_Cos_1d",
                      dict(CFG, change_point=0.1), POLICY)
    assert s.toeplitz
    res = s.train(nepoch=40, verbose=False)
    assert np.isfinite(res.min_err)


def test_toeplitz_expand_custom_vjp_matches_scatter():
    """The scatter-free backward (pad + gather + reduce diagonal sums)
    produces exactly the gather's autodiff cotangent."""
    import jax
    from gphm_tpu.ops.gram import make_toeplitz_expand

    N = 23
    expand = make_toeplitz_expand(N)
    i = np.arange(N)
    idx = jnp.asarray((i[:, None] - i[None, :]) + (N - 1), jnp.int32)
    kv = jnp.asarray(np.random.default_rng(0).normal(size=2 * N - 1))
    W = jnp.asarray(np.random.default_rng(1).normal(size=(N, N)))

    np.testing.assert_array_equal(np.asarray(expand(kv)),
                                  np.asarray(jnp.take(kv, idx, axis=0)))
    g_custom = jax.grad(lambda v: jnp.sum(W * expand(v)))(kv)
    g_ref = jax.grad(lambda v: jnp.sum(W * jnp.take(v, idx, axis=0)))(kv)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-13, atol=1e-13)
