"""Kronecker-product covariance algebra.

The reference exploits a grid factorization K = K1 (x) K2 so only per-dimension
N x N matrices are ever factorized (reference: code/model_GP_solver_2d.py:97-121,
157-162). This module makes that structure a first-class operator:

    matvec  (K1 (x) K2) vec(U) = vec(K1 U K2')        — two MXU matmuls
    solve   (K1 (x) K2)^-1 vec(U) = vec(K1^-1 U K2^-1) — per-dim Cholesky
    logdet  N2 log|K1| + N1 log|K2|

All operations take/return U in its natural (N1, N2) grid layout (row-major
vec convention), which is also the layout sharded over the device mesh in
multi-chip runs (columns of U on the mesh's model axis).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gphm_tpu.ops.chol import SPDFactor, robust_cholesky


class KronOperator(NamedTuple):
    """A = K1 (x) K2 acting on grid-shaped U (N1, N2)."""

    K1: jax.Array
    K2: jax.Array

    @property
    def shape(self):
        return (self.K1.shape[0], self.K2.shape[0])

    def matvec(self, U):
        return self.K1 @ U @ self.K2.T

    def factor(self, base_jitter: float = 1e-6, growth: float = 100.0,
               max_tries: int = 3) -> "KronFactor":
        return KronFactor(
            F1=robust_cholesky(self.K1, base_jitter, growth, max_tries),
            F2=robust_cholesky(self.K2, base_jitter, growth, max_tries),
        )


class KronFactor(NamedTuple):
    """Per-dimension Cholesky factors of a Kronecker operator."""

    F1: SPDFactor
    F2: SPDFactor

    def solve(self, U):
        """(K1 (x) K2)^-1 vec(U), grid layout."""
        return self.F2.solve(self.F1.solve(U).T).T

    def solve1(self, U):
        """K1^-1 U (the reference's K1inv_U, code/model_GP_solver_2d.py:104)."""
        return self.F1.solve(U)

    def solve2t(self, U):
        """K2^-1 U' (the reference's K2inv_Ut, code/model_GP_solver_2d.py:105)."""
        return self.F2.solve(U.T)

    def logdet(self, N1: Optional[int] = None, N2: Optional[int] = None):
        n1 = self.F1.L.shape[0] if N1 is None else N1
        n2 = self.F2.L.shape[0] if N2 is None else N2
        return n2 * self.F1.logdet() + n1 * self.F2.logdet()

    def quad(self, U):
        """vec(U)' (K1 (x) K2)^-1 vec(U) via the factored identity
        sum(K1invU * (K2invUt)') (reference: code/model_GP_solver_2d.py:161-162)."""
        return jnp.sum(self.solve1(U) * self.solve2t(U).T)
