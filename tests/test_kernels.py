"""Kernel-layer unit tests.

Validates the closed-form batched kernels and derivative cross-covariances
against (a) independent numpy formulas written from the published kernel
definitions, (b) nested-autodiff derivatives (the reference's computation
scheme, code/kernel_matrix.py:49-82), and (c) finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.ops.kernels import (KERNELS, get_kernel, init_mixture_params,
                                  _autodiff_deriv)

ALL = ["SE_Cos_1d", "Matern52_Cos_1d", "Matern52_1d", "SE_1d"]


def params_for(name, Q=4, seed=0):
    rng = np.random.default_rng(seed)
    p = {
        "log-w": jnp.asarray(rng.normal(size=Q) * 0.3 - np.log(Q)),
        "log-ls": jnp.asarray(rng.normal(size=Q) * 0.3),
    }
    if "freq" in get_kernel(name).param_names:
        p["freq"] = jnp.asarray(np.linspace(0.0, 1.0, Q) * 15.0)
    else:
        p["freq"] = jnp.asarray(np.zeros(Q))  # unused
    return p


def taus():
    t = np.concatenate([np.linspace(-1.5, 1.5, 41), [0.0, 1e-12, -1e-12]])
    return jnp.asarray(t)


# ---------------------------------------------------------------------------
# values vs independent numpy formulas
# ---------------------------------------------------------------------------

def numpy_kernel(name, tau, p):
    tau = np.asarray(tau)[..., None]
    w = np.exp(np.asarray(p["log-w"]))
    d = np.abs(tau)
    if name == "SE_Cos_1d":
        base = np.exp(-d ** 2 * np.exp(np.asarray(p["log-ls"])))
        cos = np.cos(2 * np.pi * d * np.asarray(p["freq"]))
        return (w * base * cos).sum(-1)
    if name == "Matern52_Cos_1d":
        a = np.exp(np.asarray(p["log-ls"]))
        m = (1 + np.sqrt(5) * d * a + 5 / 3 * d ** 2 * a ** 2) \
            * np.exp(-np.sqrt(5) * d * a)
        cos = np.cos(2 * np.pi * d * np.asarray(p["freq"]))
        return (w * m * cos).sum(-1)
    if name == "Matern52_1d":
        a = np.exp(np.asarray(p["log-ls"]))
        m = (1 + np.sqrt(5) * d * a + 5 / 3 * d ** 2 * a ** 2) \
            * np.exp(-np.sqrt(5) * d * a)
        return (w * m).sum(-1)
    if name == "SE_1d":
        return (w * np.exp(-d ** 2 * np.exp(np.asarray(p["log-ls"])))).sum(-1)
    raise KeyError(name)


@pytest.mark.parametrize("name", ALL)
def test_kappa_matches_published_formula(name):
    k = get_kernel(name)
    p = params_for(name)
    t = taus()
    np.testing.assert_allclose(np.asarray(k.kappa(t, p)),
                               numpy_kernel(name, t, p), rtol=1e-12)


# ---------------------------------------------------------------------------
# closed-form derivatives vs nested autodiff (reference scheme)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ALL)
@pytest.mark.parametrize("order", [1, 2])
def test_closed_form_matches_autodiff(name, order):
    k = get_kernel(name)
    p = params_for(name)
    t = taus()
    closed = np.asarray(k.deriv(order)(t, p))
    auto = np.asarray(_autodiff_deriv(k.kappa_scalar, order)(t, p))
    np.testing.assert_allclose(closed, auto, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("name", ALL)
def test_higher_derivs_available(name):
    """d3/d4 (the reference's D_x1_DD_y1 / DD_x1_DD_y1 surface) exist and are
    finite away from the diagonal."""
    k = get_kernel(name)
    p = params_for(name)
    t = jnp.asarray(np.linspace(0.05, 1.0, 9))
    for order in (3, 4):
        v = np.asarray(k.deriv(order)(t, p))
        assert np.isfinite(v).all()


@pytest.mark.parametrize("name", ALL)
def test_xy_autodiff_equivalence(name):
    """d/dx k(x, y) == g'(x - y): validate the tau-form against two-argument
    nested grads exactly as the reference computes them
    (code/kernel_matrix.py:49-57)."""
    k = get_kernel(name)
    p = params_for(name)

    def kxy(x, y):
        return k.kappa_scalar(x - y, p)

    xs = jnp.asarray(np.linspace(0.0, 1.0, 7))
    ys = jnp.asarray(np.linspace(0.0, 1.0, 7) + 0.33)
    t = xs - ys
    d1_ref = jax.vmap(jax.grad(kxy, 0))(xs, ys)
    d2_ref = jax.vmap(jax.grad(jax.grad(kxy, 0), 0))(xs, ys)
    dxy_ref = jax.vmap(jax.grad(jax.grad(kxy, 0), 1))(xs, ys)
    np.testing.assert_allclose(np.asarray(k.D_x1(t, p)), np.asarray(d1_ref),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(k.DD_x1(t, p)), np.asarray(d2_ref),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(k.D_x1_D_y1(t, p)),
                               np.asarray(dxy_ref), rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("name", ALL)
def test_higher_order_xy_equivalence(name):
    """D_x1_DD_y1 (3rd) and DD_x1_DD_y1 (4th) against two-argument nested
    grads — the reference's full derivative-op surface
    (code/kernel_matrix.py:74-82)."""
    k = get_kernel(name)
    p = params_for(name)

    def kxy(x, y):
        return k.kappa_scalar(x - y, p)

    xs = jnp.asarray(np.linspace(0.1, 1.0, 5))
    ys = jnp.asarray(np.linspace(0.0, 0.9, 5) + 0.21)
    t = xs - ys
    d3_ref = jax.vmap(jax.grad(jax.grad(jax.grad(kxy, 0), 1), 1))(xs, ys)
    d4_ref = jax.vmap(
        jax.grad(jax.grad(jax.grad(jax.grad(kxy, 0), 0), 1), 1))(xs, ys)
    np.testing.assert_allclose(np.asarray(k.D_x1_DD_y1(t, p)),
                               np.asarray(d3_ref), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(k.DD_x1_DD_y1(t, p)),
                               np.asarray(d4_ref), rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("name", ALL)
def test_finite_differences(name):
    k = get_kernel(name)
    p = params_for(name)
    t = jnp.asarray(np.linspace(-0.9, 0.9, 13) + 0.017)
    h = 1e-5
    fd1 = (np.asarray(k.kappa(t + h, p)) - np.asarray(k.kappa(t - h, p))) \
        / (2 * h)
    np.testing.assert_allclose(np.asarray(k.d1(t, p)), fd1,
                               rtol=5e-5, atol=5e-5)
    fd2 = (np.asarray(k.kappa(t + h, p)) - 2 * np.asarray(k.kappa(t, p))
           + np.asarray(k.kappa(t - h, p))) / h ** 2
    np.testing.assert_allclose(np.asarray(k.d2(t, p)), fd2,
                               rtol=5e-4, atol=5e-4)


def test_init_mixture_params_reference_values():
    """log-w = log(1/Q), ls = 0, freq = linspace * scale
    (reference: code/model_GP_solver_1d.py:206-210)."""
    p = init_mixture_params(30, 20.0, jnp.float64)
    np.testing.assert_allclose(np.asarray(p["log-w"]), np.log(1 / 30))
    np.testing.assert_allclose(np.asarray(p["log-ls"]), 0.0)
    np.testing.assert_allclose(np.asarray(p["freq"]),
                               np.linspace(0, 1, 30) * 20.0)


def test_registry_names():
    for name in ALL:
        assert KERNELS[name].name == name
    with pytest.raises(KeyError):
        get_kernel("nope")


def test_spectral_freqs_finds_lines():
    """Periodogram init places components on the true spectral lines of the
    hard configs (sub-bin accuracy), with linspace coverage retained."""
    import math
    from gphm_tpu.ops.kernels import spectral_freqs
    from gphm_tpu.problems.equations import make_problem

    # one line at 500/(2pi) ~ 79.58 cycles/unit (u = sin(500x) - 2(x-.5)^2)
    p = make_problem("poisson_1d-x2_add_sinx", 400, 1.0)
    f = np.asarray(spectral_freqs(p.X_col64, p.src64, 30, 100.0))
    assert f.shape == (30,)
    assert np.min(np.abs(f - 500 / (2 * np.pi))) < 0.05
    # coverage half keeps the reference linspace
    np.testing.assert_allclose(f[:15], np.linspace(0, 1, 15) * 100.0)
    # single-line source: redundant components bracket the line
    assert np.ptp(f[15:]) < 5.0

    # three lines (u = sin x + 0.1 sin 20x + 0.05 sin 100x)
    p2 = make_problem("poisson_1d-mix_sin", 300, 2 * math.pi)
    f2 = np.asarray(spectral_freqs(p2.X_col64, p2.src64, 30, 20.0))
    for line in (1.0, 20.0, 100.0):
        assert np.min(np.abs(f2 - line / (2 * np.pi))) < 0.06, line


def test_spectral_freqs_2d_magnitude_averaged():
    """2D grids: spectra are magnitude-averaged per column — averaging the
    signal itself would cancel separable lines like sin(100x) sin(100y)."""
    from gphm_tpu.ops.kernels import spectral_freqs
    from gphm_tpu.problems.equations import make_problem

    p = make_problem("poisson_2d-sin_sin", 200, 1.0)
    src = np.asarray(p.src64)
    for vals in (src, src.T):
        f = np.asarray(spectral_freqs(p.x_col64, vals, 30, 40.0))
        assert np.min(np.abs(f - 100 / (2 * np.pi))) < 0.05


def test_init_mixture_params_explicit_freqs():
    freqs = np.array([1.0, 2.5, 7.25])
    p = init_mixture_params(3, 20.0, jnp.float64, freqs=freqs)
    np.testing.assert_allclose(np.asarray(p["freq"]), freqs)


def test_solver_spectral_init_config(problem_1d_factory=None):
    """config freq_init='spectral' reaches init_params in both solvers."""
    import math
    from gphm_tpu.models.solver_1d import Solver1D
    from gphm_tpu.models.solver_2d import Solver2D
    from gphm_tpu.problems.equations import make_problem

    cfg = dict(Q=12, lr=0.01, llk_weight=200, freq_scale=50, logdet=True,
               tol=-1, change_point=0.5, freq_init="spectral")
    # N must resolve the 200/(2pi) ~ 31.8 cycles/unit line over 2pi units
    # (Nyquist (N-1)/(2 * 2pi) > 31.8 -> N > 401)
    p = make_problem("poisson_1d-x_time_sinx", 500, 2 * math.pi)
    s = Solver1D(p, "Matern52_Cos_1d", cfg)
    f = np.asarray(s.init_params()["kernel_paras"]["freq"])
    assert np.min(np.abs(f - 200 / (2 * np.pi))) < 0.1

    p2 = make_problem("poisson_2d-sin_sin", 100, 1.0)
    s2 = Solver2D(p2, "Matern52_Cos_1d", {**cfg, "freq_scale": 40})
    prm = s2.init_params()
    for tag in ("1", "2"):
        f2 = np.asarray(prm[f"kernel_paras_{tag}"]["freq"])
        assert np.min(np.abs(f2 - 100 / (2 * np.pi))) < 0.15


def test_spectral_freqs_peakless_source_falls_back_to_linspace():
    """A constant/zero source has no interior spectral lines; every interior
    'peak' is window-sidelobe or roundoff noise and must be rejected (the
    floor is relative to the full spectrum, DC included) — regression for
    spectral init seeding near-Nyquist garbage components."""
    from gphm_tpu.ops.kernels import spectral_freqs

    x = np.linspace(0.0, 1.0, 200)
    for vals in (np.zeros(200), np.ones(200), np.full(200, 7.25)):
        f = np.asarray(spectral_freqs(x, vals, 8, 20.0))
        np.testing.assert_allclose(f, np.linspace(0.0, 1.0, 8) * 20.0)
