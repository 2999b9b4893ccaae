"""Fused Pallas Gram-pair kernel vs the closed-form XLA path.

On CPU the kernel runs in interpreter mode — same program, same semantics —
so these tests validate the Pallas lowering logic; the TPU compiled path is
exercised by bench.py on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.ops.gram import gram
from gphm_tpu.ops.kernels import get_kernel
from gphm_tpu.ops.pallas_gram import gram_pair_from_params, supports

KERNELS = ["SE_Cos_1d", "Matern52_Cos_1d", "SE_1d", "Matern52_1d"]


def params_for(name, Q, seed=0):
    rng = np.random.default_rng(seed)
    p = {"log-w": jnp.asarray(rng.normal(size=Q) * 0.3 - np.log(Q)),
         "log-ls": jnp.asarray(rng.normal(size=Q) * 0.3)}
    if "freq" in get_kernel(name).param_names:
        p["freq"] = jnp.asarray(np.linspace(0, 1, Q) * 12.0)
    return p


@pytest.mark.parametrize("name", KERNELS)
@pytest.mark.parametrize("deriv", [1, 2])
def test_pallas_matches_reference_path(name, deriv):
    assert supports(name)
    Q = 6
    x = jnp.asarray(np.linspace(0, 2 * np.pi, 40))
    p = params_for(name, Q)
    K, Kd = gram_pair_from_params(name, x, p, deriv=deriv, jitter=1e-6)
    kern = get_kernel(name)
    K_ref = gram(kern, x, p, deriv=0, jitter=1e-6)
    Kd_ref = gram(kern, x, p, deriv=deriv)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Kd), np.asarray(Kd_ref),
                               rtol=1e-10, atol=1e-10)


def test_pallas_nondivisible_shapes():
    """N not a multiple of the tile sizes (e.g. the reference's N_col=400)."""
    x = jnp.asarray(np.linspace(0, 1, 137))
    p = params_for("Matern52_Cos_1d", 5)
    K, Kd = gram_pair_from_params("Matern52_Cos_1d", x, p, deriv=2)
    kern = get_kernel("Matern52_Cos_1d")
    np.testing.assert_allclose(np.asarray(K),
                               np.asarray(gram(kern, x, p)), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(Kd),
                               np.asarray(gram(kern, x, p, deriv=2)),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("name", ["SE_Cos_1d", "Matern52_Cos_1d"])
def test_pallas_gradients_match(name):
    """Custom VJP parameter gradients == autodiff of the closed-form path."""
    Q = 4
    x = jnp.asarray(np.linspace(0, 1, 24))
    p = params_for(name, Q)
    kern = get_kernel(name)

    def loss_pallas(p):
        K, Kd = gram_pair_from_params(name, x, p, deriv=2, jitter=1e-6)
        return jnp.sum(K * jnp.cos(K)) + jnp.sum(Kd ** 2) * 1e-6

    def loss_ref(p):
        K = gram(kern, x, p, jitter=1e-6)
        Kd = gram(kern, x, p, deriv=2)
        return jnp.sum(K * jnp.cos(K)) + jnp.sum(Kd ** 2) * 1e-6

    g1 = jax.grad(loss_pallas)(p)
    g2 = jax.grad(loss_ref)(p)
    for k in p:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-8, atol=1e-10)
