"""Two-float (df32) compensated arithmetic and the exact-phase Gram tier.

The accuracy claim under test: for high-frequency mixture kernels the f32
Gram error is dominated by the trig phase |2 pi f tau| * eps(f32); the
two-float phase path must push entry errors down to ~eps(f32) absolute.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.ops import df32
from gphm_tpu.ops.df32 import TwoFloat
from gphm_tpu.ops.gram import AxisGram
from gphm_tpu.ops.kernels import get_kernel


def test_eft_selfcheck():
    """Error-free transforms must survive XLA compilation on this backend."""
    assert df32.eft_selfcheck()


def test_two_sum_two_prod_exact():
    rng = np.random.default_rng(0)
    a64 = rng.normal(size=1000)
    b64 = rng.normal(size=1000) * 1e-6
    a = jnp.asarray(a64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    s, e = jax.jit(df32.two_sum)(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), exact)
    p, pe = jax.jit(df32.two_prod)(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(pe, np.float64), exact)


def test_mul_add_accuracy():
    rng = np.random.default_rng(1)
    x64 = rng.normal(size=500) * 100
    y64 = rng.normal(size=500)
    x, y = df32.from_f64(x64), df32.from_f64(y64)
    got = np.asarray(jax.jit(df32.mul)(x, y).value64())
    np.testing.assert_allclose(got, np.asarray(x.value64())
                               * np.asarray(y.value64()), rtol=1e-13)
    got = np.asarray(jax.jit(df32.add)(x, y).value64())
    np.testing.assert_allclose(got, np.asarray(x.value64())
                               + np.asarray(y.value64()), rtol=1e-13)


def test_cos_sin_2pi_large_phase():
    """Phase up to ~2pi*100*6.3 ~ 4000 rad: plain f32 loses ~1e-4; the
    compensated path must stay at ~eps(f32)."""
    rng = np.random.default_rng(2)
    d64 = rng.uniform(0, 2 * np.pi, size=2000)
    f = jnp.asarray(rng.uniform(0, 100, size=2000), jnp.float32)
    f64 = np.asarray(f, np.float64)
    C, S = jax.jit(df32.cos_sin_2pi)(df32.from_f64(d64), f)
    Cref = np.cos(2 * np.pi * f64 * d64)
    Sref = np.sin(2 * np.pi * f64 * d64)
    assert np.abs(np.asarray(C, np.float64) - Cref).max() < 5e-7
    assert np.abs(np.asarray(S, np.float64) - Sref).max() < 5e-7
    # plain f32 really is worse on the same inputs (sanity of the premise)
    naive = np.cos(np.float32(2 * np.pi) * np.asarray(f)
                   * d64.astype(np.float32))
    assert np.abs(naive - Cref).max() > 1e-5


def test_cos_sin_2pi_gradient():
    """d/dfreq must match the analytic derivative -2 pi d sin(2 pi f d)."""
    d = df32.from_f64(np.array([3.7]))
    f0 = 41.3

    def c_of_f(f):
        return df32.cos_sin_2pi(d, f)[0].sum()

    g = float(jax.grad(c_of_f)(jnp.float32(f0)))
    expect = -2 * np.pi * 3.7 * np.sin(2 * np.pi * f0 * 3.7)
    np.testing.assert_allclose(g, expect, rtol=2e-4)


@pytest.mark.parametrize("kname", ["SE_Cos_1d", "Matern52_Cos_1d"])
@pytest.mark.parametrize("deriv", [0, 1, 2])
def test_exact_phase_gram_beats_plain_f32(kname, deriv):
    """Gram entries from the two-float tier must be ~100x closer to the f64
    truth than the plain f32 tier for a high-frequency mixture."""
    k = get_kernel(kname)
    N, Q = 120, 8
    x64 = np.linspace(0, 2 * np.pi, N)
    rng = np.random.default_rng(3)
    p32 = {"log-w": jnp.asarray(rng.normal(size=Q) * 0.3, jnp.float32),
           "log-ls": jnp.asarray(rng.normal(size=Q) * 0.3, jnp.float32),
           "freq": jnp.asarray(np.linspace(1, 80, Q), jnp.float32)}
    p64 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), p32)

    ax_exact = AxisGram(x64.astype(np.float32), jnp.float32, x64=x64,
                        phase_exact=True)
    ax_plain = AxisGram(x64.astype(np.float32), jnp.float32, x64=x64,
                        phase_exact=False)
    K64 = np.asarray(ax_exact.gram(k, p64, deriv=deriv, wide=True),
                     np.float64)
    scale = np.abs(K64).max()
    err_exact = np.abs(np.asarray(ax_exact.gram(k, p32, deriv=deriv),
                                  np.float64) - K64).max() / scale
    err_plain = np.abs(np.asarray(ax_plain.gram(k, p32, deriv=deriv),
                                  np.float64) - K64).max() / scale
    assert err_exact < 1e-6, f"exact-phase tier too lossy: {err_exact}"
    assert err_exact * 20 < err_plain, (
        f"exact {err_exact} vs plain {err_plain}: no headroom")


def test_exact_phase_loss_grad_close_to_f64():
    """End-to-end: the f32 exact-phase training loss/grad on a hard
    high-frequency problem tracks the f64 loss far better than plain f32."""
    from gphm_tpu.models.solver_1d import Solver1D
    from gphm_tpu.precision import Policy
    from gphm_tpu.problems.equations import make_problem

    cfg = dict(Q=10, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
               freq_scale=100.0, jitter=1e-6)
    prob64 = make_problem("poisson_1d-x2_add_sinx", N_col=96, scale=1.0)
    prob32 = make_problem("poisson_1d-x2_add_sinx", N_col=96, scale=1.0,
                          dtype=jnp.float32)
    s64 = Solver1D(prob64, "Matern52_Cos_1d", cfg, Policy(jnp.float64))
    # phase_exact defaults to auto->off (round 3: plain-f32 runs are
    # solve-limited); the exact-phase tier stays opt-in
    sex = Solver1D(prob32, "Matern52_Cos_1d", dict(cfg, phase_exact="on"),
                   Policy(jnp.float32))
    spl = Solver1D(prob32, "Matern52_Cos_1d", dict(cfg, phase_exact=False),
                   Policy(jnp.float32))
    assert sex.axis.phase_exact and not spl.axis.phase_exact

    params64 = s64.init_params()
    rng = np.random.default_rng(4)
    params64["u"] = jnp.asarray(rng.normal(size=(96, 1)) * 0.1)
    params32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), params64)

    l64 = float(s64.loss(params64))
    lex = float(sex.loss(params32))
    lpl = float(spl.loss(params32))
    assert abs(lex - l64) <= abs(lpl - l64) + 1e-3 * abs(l64)
    # the equation-gap part (where the c^2-amplified phase noise lands)
    g64 = float(s64.criterion(params64))
    gex = float(sex.criterion(params32))
    np.testing.assert_allclose(gex, g64, rtol=1e-4)
