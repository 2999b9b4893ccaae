"""Conjugate gradients with structured (Kronecker) matvecs.

Scale tier beyond the reference's dense-factorization limit (N_col <= 900 per
dimension, reference: code/config/poisson_1d-mix_sin.yaml:12): for >= 512^2
collocation grids the Kronecker matvec K1 @ U @ K2' costs two MXU matmuls per
iteration instead of an O((N1 N2)^3) factorization.

Runs entirely inside jit via ``lax.while_loop``; shapes are static, tolerance
check is device-side.
"""

from __future__ import annotations

import functools
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


# ---------------------------------------------------------------------------
# Differentiable SPD solve via CG (implicit differentiation)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def psd_solve_cg(K, B, tol: float = 1e-8, maxiter: int = 1000):
    """X = K^-1 B for SPD K, computed by CG with implicit-diff gradients.

    ``lax.while_loop`` is not reverse-mode differentiable, so the VJP uses
    the implicit function theorem: with cotangent G,

        dB = K^-1 G          (one more CG solve)
        dK = -(K^-1 G) X'

    which is exact at convergence — the adjoint never unrolls the iteration.
    This is the factorization-free path for grids beyond dense-Cholesky
    scale (BASELINE.md: 512^2 collocation via CG + Kronecker matvec); the
    matvec is a plain matmul, so it shards over the device mesh with no
    special handling.
    """
    return cg_solve(lambda v: K @ v, B, tol=tol, maxiter=maxiter).x


def _psd_solve_cg_fwd(K, B, tol, maxiter):
    X = psd_solve_cg(K, B, tol, maxiter)
    return X, (K, X)


def _psd_solve_cg_bwd(tol, maxiter, res, G):
    K, X = res
    S = cg_solve(lambda v: K @ v, G, tol=tol, maxiter=maxiter).x
    dK = -S @ X.T if X.ndim == 2 else -jnp.outer(S, X)
    return dK, S


psd_solve_cg.defvjp(_psd_solve_cg_fwd, _psd_solve_cg_bwd)
