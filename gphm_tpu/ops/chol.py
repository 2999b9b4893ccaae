"""SPD solve path: one Cholesky factor shared by solve, logdet, and gradients.

The reference computes ``jnp.linalg.solve(K, u)`` (LU) and
``jnp.linalg.slogdet(K)`` (another LU) separately inside the differentiated
loss (reference: code/model_GP_solver_1d.py:92,135-137). Here a single
Cholesky factorization provides:

  * solves       K^-1 U  via two triangular solves,
  * log|K|       as 2 * sum(log diag L),
  * quadratic    u' K^-1 u,

and JAX's Cholesky differentiation rule reuses the factor in reverse mode.

Robustness (absent from the reference; SURVEY §5 "failure detection"): if the
factorization would produce non-finite entries — a real risk in float32 with
the reference's 1e-6 jitter — the jitter is escalated geometrically. The
escalation level is chosen by a **gradient-free probe chain** under
``lax.cond`` (later probes only run when earlier ones fail), and exactly one
differentiable Cholesky then runs at the chosen level. This keeps reverse-mode
AD away from any NaN factor (the 0 * NaN trap) at the cost of one extra
factorization in the forward pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


class SPDFactor(NamedTuple):
    """Lower-triangular Cholesky factor bundle."""

    L: jax.Array            # lower factor of K + extra_jitter * I
    jitter_used: jax.Array  # scalar: escalation jitter actually applied (0 if none)

    def solve(self, B):
        """K^-1 B via two triangular solves (batched when L is (..., N, N))."""
        y = solve_triangular(self.L, B, lower=True)
        return solve_triangular(jnp.swapaxes(self.L, -1, -2), y, lower=False)

    def half_solve(self, B):
        """L^-1 B — for quadratic forms u'K^-1 u = ||L^-1 u||^2."""
        return solve_triangular(self.L, B, lower=True)

    def logdet(self):
        """log|K| (per batch element when L is batched (..., N, N))."""
        d = jnp.diagonal(self.L, axis1=-2, axis2=-1)
        return 2.0 * jnp.sum(jnp.log(d), axis=-1)


def robust_cholesky(K, base_jitter: float = 1e-6, growth: float = 100.0,
                    max_tries: int = 3) -> SPDFactor:
    """Cholesky with geometric jitter escalation on non-finite factors.

    ``K`` is assumed to already include the model's base jitter (parity with
    the reference Gram builder, code/kernel_matrix.py:28); escalation adds
    more only when a probe factorization comes back non-finite.
    """
    if max_tries <= 0:
        return SPDFactor(L=jnp.linalg.cholesky(K),
                         jitter_used=jnp.zeros((), K.dtype))

    Kp = jax.lax.stop_gradient(K)
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)  # broadcasts over batch dims

    def probe_ok(extra):
        return jnp.all(jnp.isfinite(jnp.linalg.cholesky(Kp + extra * eye)))

    levels = [0.0] + [base_jitter * growth ** (i + 1) for i in range(max_tries)]

    def select(i: int):
        # returns a traced scalar: first level from i on whose probe succeeds
        # (falls back to the largest level).
        if i == len(levels) - 1:
            return jnp.asarray(levels[i], K.dtype)
        return jax.lax.cond(
            probe_ok(levels[i]),
            lambda: jnp.asarray(levels[i], K.dtype),
            lambda: select(i + 1))

    extra = select(0)
    L = jnp.linalg.cholesky(K + extra * eye)
    return SPDFactor(L=L, jitter_used=extra)


def policy_cholesky(K, policy) -> SPDFactor:
    """robust_cholesky under a precision policy: factorizes in
    ``policy.solve_dtype`` when set (mixed precision), else in K's dtype.
    Callers cast solve results back with ``SPDFactor.L.dtype`` vs params."""
    if policy.solve_dtype is not None:
        K = K.astype(policy.solve_dtype)
    return robust_cholesky(K, policy.jitter, policy.jitter_growth,
                           policy.max_jitter_tries)


def spd_factor(K, policy=None) -> SPDFactor:
    """Factor K (which already carries base jitter) under a precision policy."""
    if policy is None:
        return robust_cholesky(K)
    return robust_cholesky(K, base_jitter=policy.jitter,
                           growth=policy.jitter_growth,
                           max_tries=policy.max_jitter_tries)
