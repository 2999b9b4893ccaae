"""Gram-matrix assembly on difference matrices.

Replaces the reference's ``vmap``-over-N^2-scalars Gram builder
(reference: code/kernel_matrix.py:21-30) with a single broadcasted evaluation
of the kernel on the (N, M) signed-difference matrix, batched over the Q
mixture components. XLA fuses the mixture reduction, so no (N, M, Q)
intermediate is materialized in HBM.
"""

from __future__ import annotations

import jax.numpy as jnp

from gphm_tpu.ops.kernels import StationaryKernel


def _tau(x1, x2):
    x1 = jnp.asarray(x1).reshape(-1)
    x2 = jnp.asarray(x2).reshape(-1)
    return x1[:, None] - x2[None, :]


def gram(kernel: StationaryKernel, x, params, *, deriv: int = 0,
         jitter: float = 0.0):
    """Square (cross-)covariance matrix on collocation points ``x``.

    deriv=0 -> K[i,j] = k(x_i, x_j)          (+ jitter * I)
    deriv=1 -> K[i,j] = cov(f'(x_i), f(x_j))     [D_x1, reference :49-52]
    deriv=2 -> K[i,j] = cov(f''(x_i), f(x_j))    [DD_x1, reference :54-57]
    deriv=3 -> K[i,j] = cov(f'(x_i), f''(x_j))   [D_x1_DD_y1, reference :79-82]
    deriv=4 -> K[i,j] = cov(f''(x_i), f''(x_j))  [DD_x1_DD_y1, reference :74-77]
    """
    t = _tau(x, x)
    K = kernel.deriv(deriv)(t, params)
    if jitter:
        K = K + jitter * jnp.eye(t.shape[0], dtype=K.dtype)
    return K


def cross_gram(kernel: StationaryKernel, x1, x2, params, *, deriv: int = 0):
    """Rectangular cross-covariance between test points x1 and training x2
    (reference preds cross-Gram: code/model_GP_solver_1d.py:172-178)."""
    return kernel.deriv(deriv)(_tau(x1, x2), params)
