"""Stochastic Lanczos quadrature (SLQ) log-determinants.

The reference always has a dense factorization in hand, so its log-prior
normalization is exact (reference: code/model_GP_solver_1d.py:135-137,
code/model_GP_solver_2d.py:157-162). The strictly factorization-free CG tier
(ops/cg.py, beyond-reference grids) has no factor to read a determinant
from; this module supplies the standard completion:

    logdet(K) = tr(log K) ~ (1/M) sum_m  z_m' log(K) z_m
    z_m' log(K) z_m       = ||z_m||^2  sum_i (e1' u_i)^2 log(lambda_i)

with Rademacher probes z_m and (lambda_i, u_i) the eigenpairs of the k-step
Lanczos tridiagonalization of K started at z_m / ||z_m||. Everything is
matvecs: cost M * k * O(N^2) and a k x k eigendecomposition — no O(N^3)
factorization anywhere.

The gradient d logdet = tr(K^-1 dK) is estimated with the SAME probes
(the Hutchinson coupling that keeps value and gradient consistent):

    tr(K^-1 dK) ~ (1/M) sum_m (K^-1 z_m)' dK z_m

with K^-1 z_m from preconditioner-free CG. The custom VJP therefore never
differentiates through the Lanczos recurrence (numerically fragile and
memory-hungry under reverse mode).

Probes are fixed by an integer seed so the objective is deterministic across
steps — the bias of a fixed probe set is constant and does not steer Adam,
while resampled probes would inject gradient noise the reference's exact
objective does not have.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gphm_tpu.ops.cg import cg_solve


def lanczos_tridiag(matvec, v0, iters: int):
    """k-step Lanczos with full reorthogonalization.

    Returns (alphas (k,), betas (k-1,), V (N, k)). Full reorthogonalization
    (one Gram-Schmidt pass against all previous vectors per step) is what
    makes the recurrence usable in float32 — the plain three-term recurrence
    loses orthogonality within ~10 steps at production conditioning.
    """
    n = v0.shape[0]
    dtype = v0.dtype
    V = jnp.zeros((n, iters), dtype)
    alphas = jnp.zeros((iters,), dtype)
    betas = jnp.zeros((iters,), dtype)

    v = v0 / jnp.linalg.norm(v0)
    V = V.at[:, 0].set(v)

    def body(j, carry):
        V, alphas, betas = carry
        v = V[:, j]
        w = matvec(v)
        alpha = jnp.vdot(v, w)
        w = w - alpha * v - jnp.where(j > 0, betas[j - 1], 0.0) \
            * V[:, jnp.maximum(j - 1, 0)]
        # full reorthogonalization against the columns built so far
        mask = (jnp.arange(iters) <= j).astype(dtype)
        coeffs = (V.T @ w) * mask
        w = w - V @ coeffs
        beta = jnp.linalg.norm(w)
        safe = beta > jnp.asarray(1e-12, dtype)
        v_next = jnp.where(safe, w / jnp.where(safe, beta, 1.0), 0.0)
        V = jax.lax.cond(
            j + 1 < iters,
            lambda V: V.at[:, j + 1].set(v_next), lambda V: V, V)
        alphas = alphas.at[j].set(alpha)
        betas = betas.at[j].set(jnp.where(safe, beta, 0.0))
        return V, alphas, betas

    V, alphas, betas = jax.lax.fori_loop(0, iters, body, (V, alphas, betas))
    return alphas, betas[:-1], V


def _quadrature_logdet(matvec, Z, iters: int):
    """(1/M) sum_m z' log(K) z over probe columns of Z via Lanczos."""

    def one_probe(z):
        alphas, betas, _ = lanczos_tridiag(matvec, z, iters)
        T = jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1)
        lam, U = jnp.linalg.eigh(T)
        # guard tiny/negative Ritz values (breakdown padding): their
        # quadrature weight (e1'u)^2 is ~0 there, clamp keeps log finite
        lam = jnp.maximum(lam, jnp.asarray(1e-30, lam.dtype))
        w = U[0, :] ** 2
        nrm2 = jnp.vdot(z, z)
        return nrm2 * jnp.sum(w * jnp.log(lam))

    return jnp.mean(jax.vmap(one_probe, in_axes=1)(Z))


def rademacher_probes(n: int, m: int, dtype, seed: int = 0):
    """Fixed +-1 probe matrix (n, m)."""
    bits = jax.random.bernoulli(jax.random.PRNGKey(seed), 0.5, (n, m))
    return (2.0 * bits.astype(dtype) - 1.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def slq_logdet(K, Z, iters: int = 30, cg_tol: float = 1e-6,
               cg_maxiter: int = 200, _tag: str = "slq"):
    """Stochastic logdet estimate for SPD K with probe matrix Z (N, M).

    Value: Lanczos quadrature per probe. Gradient: Hutchinson estimator
    g * (1/2M)(S Z' + Z S'), S = K^-1 Z by CG — symmetric, exact in
    expectation, and free of any factorization.
    """
    return _quadrature_logdet(lambda v: K @ v, Z, iters)


def _slq_fwd(K, Z, iters, cg_tol, cg_maxiter, _tag):
    return slq_logdet(K, Z, iters, cg_tol, cg_maxiter, _tag), (K, Z)


def _slq_bwd(iters, cg_tol, cg_maxiter, _tag, res, g):
    K, Z = res
    S = cg_solve(lambda v: K @ v, Z, tol=cg_tol, maxiter=cg_maxiter).x
    M = Z.shape[1]
    dK = g * (S @ Z.T + Z @ S.T) / (2.0 * M)
    return dK, jnp.zeros_like(Z)


slq_logdet.defvjp(_slq_fwd, _slq_bwd)
