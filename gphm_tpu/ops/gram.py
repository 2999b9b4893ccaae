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


# ---------------------------------------------------------------------------
# Toeplitz fast path for uniform collocation grids
# ---------------------------------------------------------------------------

def uniform_spacing(x) -> float | None:
    """Grid spacing if x is (numerically) uniform, else None. Every shipped
    reference config collocates on np.linspace grids
    (reference: code/model_GP_solver_1d.py:348, _2d.py:370-371).

    The tolerance is dtype-aware: consecutive diffs of an f32-cast linspace
    vary at up to ~N*eps(f32) relative to h, so a fixed f64-scale tolerance
    silently disabled this path for every float32 production run (solvers
    now pass the problem's authoritative float64 grid, making this a
    fallback for user-supplied grids)."""
    import numpy as np

    xv = np.asarray(x)
    xh = xv.astype(np.float64).reshape(-1)
    if xh.size < 2:
        return None
    eps = (np.finfo(xv.dtype).eps
           if np.issubdtype(xv.dtype, np.floating) else np.finfo(np.float64).eps)
    d = np.diff(xh)
    h = float(d.mean())
    # casting error of x_i is <= eps*|x_i|; a diff sees two of them
    atol = 4.0 * xh.size * eps * max(np.abs(xh).max(), 1e-30)
    if np.allclose(d, h, rtol=4.0 * eps, atol=atol) and abs(h) > 2 * atol:
        return h
    return None


def toeplitz_lags(N: int, h: float, dtype):
    """The 2N-1 distinct signed differences tau_ij = (i - j) h of a uniform
    grid, and the (N, N) gather index matrix mapping lag -> position."""
    import numpy as np

    lags = jnp.asarray(np.arange(-(N - 1), N) * h, dtype)
    i = np.arange(N)
    idx = jnp.asarray((i[:, None] - i[None, :]) + (N - 1), jnp.int32)
    return lags, idx


def toeplitz_gram(kernel: StationaryKernel, lags, idx, params, *,
                  deriv: int = 0, jitter: float = 0.0):
    """Gram matrix on a uniform grid via its Toeplitz structure.

    A stationary kernel on a uniform grid takes only 2N-1 distinct values, so
    the O(N^2 Q) transcendental evaluation of the dense path collapses to
    O(N Q) on the lag vector plus one structured gather — the dominant cost
    of every GP-HM training step in the reference's formulation simply
    disappears. (The reference evaluates all N^2 pairs,
    code/kernel_matrix.py:26-27.)
    """
    kvec = kernel.deriv(deriv)(lags, params)   # (2N-1,)
    K = jnp.take(kvec, idx, axis=0)
    if jitter:
        K = K + jitter * jnp.eye(idx.shape[0], dtype=K.dtype)
    return K
