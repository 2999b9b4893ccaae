"""Initializers for the latent function values at collocation points.

Parity with the reference's init_func module (reference: code/init_func.py:6-37
— rand/randn/zeros/linear/linear_randn); every shipped config uses ``zeros``
(injected at code/model_GP_solver_1d.py:419). Here they are pure functions of
shape + boundary data selected by config string instead of injected Python
objects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def zeros(N: int, bc_vals, *, key=None, dtype=jnp.float32):
    return jnp.zeros((N, 1), dtype)


def randn(N: int, bc_vals, *, key, dtype=jnp.float32):
    return jax.random.normal(key, (N, 1), dtype)


# the reference's `rand` is an alias of randn (code/init_func.py:6-13)
rand = randn


def linear(N: int, bc_vals, *, key=None, dtype=jnp.float32):
    """Linear interpolation between the two boundary values."""
    b = jnp.asarray(bc_vals, dtype).reshape(-1)
    return jnp.linspace(b[0], b[-1], N, dtype=dtype).reshape(-1, 1)


def linear_randn(N: int, bc_vals, *, key, scale: float = 0.2,
                 dtype=jnp.float32):
    return linear(N, bc_vals, dtype=dtype) \
        + jax.random.normal(key, (N, 1), dtype) * scale


INIT_U = {"zeros": zeros, "randn": randn, "rand": rand, "linear": linear,
          "linear_randn": linear_randn}


def get_init_u(name: str):
    if name not in INIT_U:
        raise KeyError(f"unknown init_u {name!r}; available: "
                       f"{sorted(INIT_U)}")
    return INIT_U[name]
