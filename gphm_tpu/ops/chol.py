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

import os
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


def use_blocked_f64(dtype, ndim: int = 2) -> bool:
    """True when an f64 factorization must avoid lax.linalg custom calls.

    Non-CPU backends emulate float64 in plain HLO (double-word passes), but
    their dense Cholesky / triangular-solve *custom calls* do not support it:
    on this TPU backend they crash the worker at N >= 400 inside scanned hot
    loops (PARITY.md round-1 numerics notes). The blocked tier
    (ops/blocked_linalg.py) is matmul/fori_loop-only HLO and inherits the
    emulation, so every f64 factorization off-CPU routes through it.

    Env override ``GPHM_BLOCKED_CHOLESKY=0/1`` forces the choice (used by
    tests to exercise the blocked tier on CPU).
    """
    force = os.environ.get("GPHM_BLOCKED_CHOLESKY")
    if force == "0":
        return False
    is_f64 = jnp.dtype(dtype) == jnp.float64
    if force == "1":
        return is_f64 and ndim == 2
    return is_f64 and ndim == 2 and jax.default_backend() != "cpu"


def robust_cholesky(K, base_jitter: float = 1e-6, growth: float = 100.0,
                    max_tries: int = 3) -> SPDFactor:
    """Cholesky with geometric jitter escalation on non-finite factors.

    ``K`` is assumed to already include the model's base jitter (parity with
    the reference Gram builder, code/kernel_matrix.py:28); escalation adds
    more only when a probe factorization comes back non-finite.
    """
    if use_blocked_f64(K.dtype, K.ndim):
        from gphm_tpu.ops.blocked_linalg import (BlockedSPDFactor,
                                                 cholesky as blocked_chol)

        def chol_fn(A):
            return blocked_chol(A, 64)

        factor = BlockedSPDFactor
    else:
        chol_fn = jnp.linalg.cholesky

        def factor(L, jitter_used):
            return SPDFactor(L=L, jitter_used=jitter_used)

    if max_tries <= 0:
        return factor(chol_fn(K), jnp.zeros((), K.dtype))

    Kp = jax.lax.stop_gradient(K)
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)  # broadcasts over batch dims

    def probe_ok(extra):
        return jnp.all(jnp.isfinite(chol_fn(Kp + extra * eye)))

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
    L = chol_fn(K + extra * eye)
    return factor(L, extra)


def policy_cholesky(K, policy) -> SPDFactor:
    """robust_cholesky under a precision policy: factorizes in
    ``policy.solve_dtype`` when set (mixed precision), else in K's dtype.
    Callers cast solve results back with ``SPDFactor.L.dtype`` vs params.

    With ``policy.refine_iters > 0`` returns the refined factor instead
    (f32 factorization + f64-residual refinement, ops/refined.py); callers
    then pass K at the wide tier."""
    if getattr(policy, "refine_iters", 0):
        from gphm_tpu.ops.refined import refined_cholesky
        return refined_cholesky(K, policy)
    if policy.solve_dtype is not None:
        K = K.astype(policy.solve_dtype)
    if policy.solve_dtype is None and use_blocked_f64(K.dtype, K.ndim):
        # An f32-policy solver asked for an f64 factor on an accelerator —
        # the prediction/eval path ("predict solves always run wide"). Use
        # the refined factor (native f32 Cholesky + fixed-iteration f64
        # PCG, ops/refined.py) instead of the blocked-HLO f64
        # factorization: it reaches the f64 solve floor in 8 iterations,
        # runs ~matmul-speed, and — decisive on this backend — the blocked
        # f64 program aborts the axon remote compiler inside the two-GP
        # eval graph (tuple_tree.cc "Index out of bounds", PARITY round-2
        # notes). Explicit mixed mode (solve_dtype=f64) keeps the blocked
        # tier.
        from gphm_tpu.ops.refined import refined_cholesky
        return refined_cholesky(K, policy, iters=8)
    return robust_cholesky(K, policy.jitter, policy.jitter_growth,
                           policy.max_jitter_tries)


def spd_factor(K, policy=None) -> SPDFactor:
    """Factor K (which already carries base jitter) under a precision policy."""
    if policy is None:
        return robust_cholesky(K)
    return robust_cholesky(K, base_jitter=policy.jitter,
                           growth=policy.jitter_growth,
                           max_tries=policy.max_jitter_tries)
