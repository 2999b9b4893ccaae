"""Conjugate gradients with structured (Kronecker) matvecs.

Scale tier beyond the reference's dense-factorization limit (N_col <= 900 per
dimension, reference: code/config/poisson_1d-mix_sin.yaml:12): for >= 512^2
collocation grids the Kronecker matvec K1 @ U @ K2' costs two MXU matmuls per
iteration instead of an O((N1 N2)^3) factorization.

Runs entirely inside jit via ``lax.while_loop``; shapes are static, tolerance
check is device-side.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    residual_norm: jax.Array


def cg_solve(matvec: Callable, b, x0=None, *, tol: float = 1e-8,
             maxiter: int = 1000,
             precond: Optional[Callable] = None) -> CGResult:
    """Preconditioned conjugate gradients for SPD operators.

    ``matvec``/``precond`` act on arrays of b's shape (grid layout for
    Kronecker operators — never flattened, so XLA keeps the matmuls tiled).
    """
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else x0
    M = precond if precond is not None else (lambda r: r)

    r = b - matvec(x)
    z = M(r)
    p = z
    rz = jnp.vdot(r, z)
    bnorm = jnp.linalg.norm(b.reshape(-1))
    atol2 = (tol * jnp.maximum(bnorm, 1e-30)) ** 2

    def cond(state):
        _, r, _, _, k = state
        return jnp.logical_and(k < maxiter,
                               jnp.vdot(r, r).real > atol2)

    def body(state):
        x, r, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        return x, r, p, rz_new, k + 1

    x, r, _, _, k = jax.lax.while_loop(
        cond, body, (x, r, p, rz, jnp.zeros((), jnp.int32)))
    return CGResult(x=x, iters=k,
                    residual_norm=jnp.linalg.norm(r.reshape(-1)))
