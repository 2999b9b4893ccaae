"""SPD factorization from XLA primitives only — the compensated-precision tier.

Why this exists: the reference needs float64 for its hardest configurations
(reference: code/kernel_matrix.py:6-7 enables x64 globally; run_1d.sh:39-40
claims rel-L2 1e-3..1e-4 on the hard 1D cases). On TPU, f64 is software
double-word (two-f32) emulation: **elementwise ops and matmuls work**, but
the dense Cholesky/triangular-solve *custom calls* crash the TPU worker at
N >= 400 inside scanned hot loops (PARITY.md numerics notes, round 1).

This module re-expresses the factorization and solves as blocked algorithms
of plain matmuls + ``fori_loop`` column sweeps. Those compile to pure XLA
HLO and therefore inherit the compiler's double-word emulation — giving the
f32 hot loop access to f64-accurate factorization ("two-f32 compensated
arithmetic", SURVEY §7 hard parts) without any custom call.

Reverse-mode: differentiating *through* a factorization loop would
checkpoint O(N) copies of the O(N^2) carry. Instead the standard closed-form
pullbacks are installed as ``custom_vjp``:

  * Cholesky:  Kbar = (1/2) L^-T (P + P') L^-1,  P = Phi(L' Lbar)
    (Murray 2016, "Differentiation of the Cholesky decomposition")
  * lower triangular solve X = L^-1 B:
    Bbar = L^-T Xbar,  Lbar = -tril(Bbar X')

so one factorization is shared by the solve, the quadratic form, the
log-determinant, and all their gradients — the same economy the native
SPDFactor path has (ops/chol.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _phi(A):
    """Lower triangle with the diagonal halved (Cholesky pullback helper)."""
    return jnp.tril(A) - 0.5 * jnp.diag(jnp.diagonal(A))


def chol_unblocked(A):
    """Cholesky of a small (b, b) SPD block via a column ``fori_loop`` of
    rank-1-free matvecs (no lax.linalg custom call)."""
    b = A.shape[0]
    rows = jnp.arange(b)

    def body(k, L):
        v = A[:, k] - L @ L[k, :]
        col = v * jax.lax.rsqrt(v[k])
        col = jnp.where(rows >= k, col, jnp.zeros_like(col))
        return L.at[:, k].set(col)

    return jax.lax.fori_loop(0, b, body, jnp.zeros_like(A))


def lower_solve_unblocked(L, B):
    """X = L^-1 B by forward substitution (row ``fori_loop``)."""
    def body(i, X):
        xi = (B[i] - L[i, :] @ X) / L[i, i]
        return X.at[i].set(xi)

    return jax.lax.fori_loop(0, L.shape[0], body, jnp.zeros_like(B))


def _pad_spd(K, Np):
    """Zero-pad K to (Np, Np) with identity on the padded diagonal."""
    N = K.shape[-1]
    if Np == N:
        return K
    Kp = jnp.zeros((Np, Np), K.dtype).at[:N, :N].set(K)
    pad = jnp.arange(Np) >= N
    return Kp + jnp.diag(pad.astype(K.dtype))


def _blocked_cholesky(K, block: int):
    N = K.shape[-1]
    if N <= block:
        return chol_unblocked(K)
    nb = -(-N // block)
    Np = nb * block
    Kp = _pad_spd(K, Np)
    L = jnp.zeros_like(Kp)
    for j in range(nb):
        c0, c1 = j * block, (j + 1) * block
        # left-looking panel update: one full-width matmul (columns of L
        # beyond c0 are still zero, so no masking is needed)
        panel = Kp[c0:, c0:c1] - L[c0:, :] @ L[c0:c1, :].T
        Ljj = chol_unblocked(panel[:block])
        L = L.at[c0:c1, c0:c1].set(Ljj)
        if j + 1 < nb:
            # below = panel[block:] @ Ljj^-T  == (Ljj^-1 panel[block:]')'
            X = lower_solve_unblocked(Ljj, panel[block:].T).T
            L = L.at[c1:, c0:c1].set(X)
    return L[:N, :N]


def _blocked_lower_solve(L, B, block: int):
    """X = L^-1 B; diagonal-block inverses are computed in parallel (vmap)
    so the sequential depth is nb block-matmuls, not N scalar steps."""
    N = L.shape[-1]
    if N <= block:
        return lower_solve_unblocked(L, B)
    nb = -(-N // block)
    Np = nb * block
    Lp = _pad_spd(L, Np)   # unit padded diagonal keeps solves well-defined
    Bp = jnp.zeros((Np,) + B.shape[1:], B.dtype).at[:N].set(B)

    diag = jnp.stack([Lp[j * block:(j + 1) * block,
                         j * block:(j + 1) * block] for j in range(nb)])
    eye = jnp.eye(block, dtype=L.dtype)
    inv = jax.vmap(lambda Lb: lower_solve_unblocked(Lb, eye))(diag)

    X = jnp.zeros_like(Bp)
    for j in range(nb):
        r0, r1 = j * block, (j + 1) * block
        acc = Bp[r0:r1] - Lp[r0:r1, :] @ X     # rows >= r0 of X still zero
        X = X.at[r0:r1].set(inv[j] @ acc)
    return X[:N]


def _rev(A):
    return jnp.flip(A, axis=tuple(range(A.ndim)))


def _blocked_upper_solve(U, B, block: int):
    """X = U^-1 B for upper-triangular U, via the reversal identity
    (J U J) (J X) = J B with J the index-reversing permutation."""
    Xr = _blocked_lower_solve(_rev(U), jnp.flip(B, 0), block)
    return jnp.flip(Xr, 0)


# ---------------------------------------------------------------------------
# differentiable wrappers (closed-form pullbacks, factor reuse)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(1,))
def cholesky(K, block: int = 64):
    """Lower Cholesky factor of SPD K, no custom calls, custom pullback."""
    return _blocked_cholesky(K, block)


def _chol_fwd(K, block):
    L = _blocked_cholesky(K, block)
    return L, L


def _chol_bwd(block, L, Lbar):
    P = _phi(L.T @ Lbar)
    A = P + P.T
    # Kbar = (1/2) L^-T (P + P') L^-1   (symmetric by construction)
    Y = _blocked_upper_solve(L.T, A, block)       # L^-T (P + P')
    Kbar = _blocked_upper_solve(L.T, Y.T, block)  # (A L^-1 solved from left)
    return (0.5 * Kbar,)


cholesky.defvjp(_chol_fwd, _chol_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def lower_solve(L, B, block: int = 64):
    """X = L^-1 B (lower triangular), differentiable in L and B."""
    return _blocked_lower_solve(L, B, block)


def _ls_fwd(L, B, block):
    X = _blocked_lower_solve(L, B, block)
    return X, (L, X)


def _ls_bwd(block, res, Xbar):
    L, X = res
    Bbar = _blocked_upper_solve(L.T, Xbar, block)
    Lbar = -jnp.tril(Bbar @ X.T)
    return Lbar, Bbar


lower_solve.defvjp(_ls_fwd, _ls_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def upper_solve(U, B, block: int = 64):
    """X = U^-1 B (upper triangular), differentiable in U and B."""
    return _blocked_upper_solve(U, B, block)


def _us_fwd(U, B, block):
    X = _blocked_upper_solve(U, B, block)
    return X, (U, X)


def _us_bwd(block, res, Xbar):
    U, X = res
    Bbar = _blocked_lower_solve(U.T, Xbar, block)
    Ubar = -jnp.triu(Bbar @ X.T)
    return Ubar, Bbar


upper_solve.defvjp(_us_fwd, _us_bwd)


class BlockedSPDFactor(NamedTuple):
    """Drop-in counterpart of ops.chol.SPDFactor built on the custom-call-free
    blocked kernels (same method surface: solve / half_solve / logdet)."""

    L: jax.Array
    jitter_used: jax.Array
    block: int = 64

    def solve(self, B):
        return upper_solve(self.L.T, lower_solve(self.L, B, self.block),
                           self.block)

    def half_solve(self, B):
        return lower_solve(self.L, B, self.block)

    def logdet(self):
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(self.L)))


def blocked_spd_factor(K, block: int = 64) -> BlockedSPDFactor:
    """Factor K (already carrying its base jitter)."""
    return BlockedSPDFactor(L=cholesky(K, block),
                            jitter_used=jnp.zeros((), K.dtype), block=block)
