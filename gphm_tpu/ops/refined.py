"""Mixed-precision SPD solves: f32 factorization + f64 PCG refinement.

The reference needs float64 end-to-end for its hardest configurations
(reference: code/kernel_matrix.py:6-7 enables x64 globally; run_1d.sh:39-40
claims rel-L2 1e-3..1e-4 on the hard 1D cases with jitter 1e-6 —
cond(K) ~ 1.2e7 at N_col=400). On TPU, f64 is software-emulated: elementwise
ops and **matmuls** work (a f64 GEMM is a handful of f32 MXU passes), while
the dense f64 factorization custom calls crash in scanned hot loops, and a
fully blocked f64 factorization in plain HLO runs ~450x slower than f32
(measured: 581 ms vs 1.29 ms per training step at N=400,
tools/probe_blocked_tpu.py).

So the factorization stays in fast native float32 and is used as a
**preconditioner for conjugate gradients run in float64**:

    P   = L32 L32' = chol(K.astype(f32))      -- one f32 MXU factorization
    x_k = PCG(K64, b; M = P^-1, k iters)      -- f64 matvecs, f32 tri-solves

Why PCG and not classical iterative refinement: at cond(K) ~ 1.2e7 the
stationary iteration matrix I - P^-1 K has spectral radius ~cond * eps(f32)
> 1 and refinement *diverges* (measured: error grows 1.4x per sweep).
CG's Krylov optimality tolerates that spread: on the production Gram it
contracts ~15x per iteration and reaches the f64 floor (~1e-9) in 8
iterations. Per iteration the only work is one f64 GEMM (cheap emulation)
plus two f32 MXU matmuls applying the materialized inverse factor L^-1
(triangular-solve custom calls are latency-bound at these sizes on TPU, so
the inverse factor is formed once per factorization and applied as the
exactly-SPD product L^-T (L^-1 r)).

Gradients use the implicit function theorem (custom_vjp), not
differentiation through the iterations:

    X = K^-1 B:   dB = K^-1 G (one more PCG),  dK = -(K^-1 G) X'
    logdet(K):    dK = g * K^-1               (PCG on the identity)

exact at convergence, and the adjoint solves run at the same refined
accuracy — this is what restores reference-f64 gradient quality on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from gphm_tpu.ops.chol import SPDFactor, robust_cholesky


def _chol_apply(Linv32, R):
    """P^-1 R = L^-T (L^-1 R) through the explicit f32 inverse FACTOR —
    two MXU matmuls.

    Linv = L^-1 is materialized once per factorization instead of applying
    two triangular solves per PCG iteration: on TPU the triangular-solve
    custom call is latency-bound at these sizes (~1 ms for a single RHS at
    N=400), and a refined step chains ~30 of them — measured 53 ms vs
    6.4 ms plain f32. Applying the inverse as the factored product keeps
    the preconditioner exactly SPD (z'r = ||Linv r||^2 >= 0), which keeps
    PCG's full contraction rate — the collapsed single-matmul form
    P = fl(L^-T L^-1) measurably stalls near 1e-5 relative where the
    factored form reaches the trisolve path's 5e-8 at 8 iterations."""
    y = Linv32 @ R.astype(Linv32.dtype)
    return (Linv32.T @ y).astype(R.dtype)


def _pcg(K, Linv32, B, iters: int):
    """Fixed-iteration preconditioned CG in K's (wide) dtype.

    The iteration count is static (jit-friendly); once the f64 floor is
    reached the updates are guarded no-ops (alpha/beta forced to 0 on a
    vanished search direction), so extra iterations are harmless.
    """
    x = jnp.zeros_like(B)
    r = B
    z = _chol_apply(Linv32, r)
    p = z
    rz = jnp.vdot(r, z)
    tiny = jnp.asarray(jnp.finfo(K.dtype).tiny, K.dtype)

    def safe_div(a, b):
        ok = jnp.abs(b) > tiny
        return jnp.where(ok, a / jnp.where(ok, b, 1.0), jnp.zeros_like(a))

    def body(_, carry):
        x, r, p, rz = carry
        Ap = K @ p
        alpha = safe_div(rz, jnp.vdot(p, Ap))
        x = x + alpha * p
        r = r - alpha * Ap
        z = _chol_apply(Linv32, r)
        rz_new = jnp.vdot(r, z)
        beta = safe_div(rz_new, rz)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def pcg_solve(K, Linv32, B, iters: int):
    """X = K^-1 B at ~f64 forward error; implicit-diff gradients."""
    return _pcg(K, Linv32, B, iters)


def _pcg_solve_fwd(K, Linv32, B, iters):
    X = _pcg(K, Linv32, B, iters)
    return X, (K, Linv32, X)


def _pcg_solve_bwd(iters, res, G):
    K, Linv32, X = res
    S = _pcg(K, Linv32, G, iters)
    dK = -S @ X.T if X.ndim == 2 else -jnp.outer(S, X)
    return dK, jnp.zeros_like(Linv32), S


pcg_solve.defvjp(_pcg_solve_fwd, _pcg_solve_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def pcg_logdet(K, ld32, Linv32, iters: int):
    """log|K| — value from the f32 factor (the log-determinant is a smooth
    regularizer; its value error ~N*eps(f32) is negligible against the
    data-fit terms), gradient K^-1 via PCG at refined accuracy (iters > 0)
    or the f32 explicit inverse (iters == 0)."""
    del Linv32, K
    return ld32


def _pcg_logdet_fwd(K, ld32, Linv32, iters):
    return ld32, (K, Linv32)


def _pcg_logdet_bwd(iters, res, g):
    K, Linv32 = res
    if iters == 0:
        # f32 gradient: K^-1 ~ P^-1 = L^-T L^-1. The matrix-RHS PCG on the
        # identity is by far the most expensive piece of a refined step, and
        # the logdet term is a smooth regularizer, so callers may trade its
        # gradient accuracy (measured ~1e-2 relative vs f64 — still 30-70x
        # better than plain f32) for the fastest step
        # (policy refine_logdet_iters=0)
        Kinv = (Linv32.T @ Linv32).astype(K.dtype)
    else:
        eye = jnp.eye(K.shape[-1], dtype=K.dtype)
        Kinv = _pcg(K, Linv32, eye, iters)
    return g * Kinv, jnp.zeros_like(g), jnp.zeros_like(Linv32)


pcg_logdet.defvjp(_pcg_logdet_fwd, _pcg_logdet_bwd)


class RefinedSPDFactor(NamedTuple):
    """f32 Cholesky factor of K (plus its materialized explicit inverse
    factor L^-1) paired with the wide (f64) matrix it preconditions;
    ``solve``/``logdet`` run PCG-refined with implicit-diff gradients.
    Drop-in for ops.chol.SPDFactor."""

    inner: SPDFactor     # f32 factor of K_wide.astype(f32) (+ escalation)
    Linv: jax.Array      # f32 explicit inverse factor L^-1 (matmul-applied)
    K_wide: jax.Array    # f64 matrix (escalation jitter already added)
    iters: int = 8
    logdet_iters: int = 8   # PCG iterations for the logdet *gradient* only
                            # (0 = f32 explicit-inverse gradient)

    @property
    def L(self):  # noqa: N802 - parity with SPDFactor surface
        return self.inner.L

    @property
    def jitter_used(self):
        return self.inner.jitter_used

    def solve(self, B):
        """K^-1 B at ~f64 forward error (result in K_wide's dtype)."""
        return pcg_solve(self.K_wide, self.Linv,
                         B.astype(self.K_wide.dtype), self.iters)

    def half_solve(self, B):
        """L^-1 B in f32 (quadratic forms that need refinement should use
        ``solve`` + an f64 dot instead)."""
        return self.inner.half_solve(B.astype(self.inner.L.dtype))

    def logdet(self):
        ld32 = self.inner.logdet().astype(self.K_wide.dtype)
        return pcg_logdet(self.K_wide, ld32, self.Linv, self.logdet_iters)


def refined_cholesky(K_wide, policy, iters: int | None = None) -> RefinedSPDFactor:
    """Factor K (given at the wide tier, already carrying base jitter) in
    float32 with robust jitter escalation; the escalation amount is added to
    the wide matrix as well so the PCG operator matches the preconditioner's
    target."""
    it = policy.refine_iters if iters is None else iters
    ld_it = getattr(policy, "refine_logdet_iters", None)
    ld_it = it if ld_it is None else ld_it
    inner = robust_cholesky(K_wide.astype(jnp.float32),
                            base_jitter=policy.jitter,
                            growth=policy.jitter_growth,
                            max_tries=policy.max_jitter_tries)
    extra = inner.jitter_used.astype(K_wide.dtype)
    eye = jnp.eye(K_wide.shape[-1], dtype=K_wide.dtype)
    K_adj = K_wide + extra * eye
    Linv = explicit_inverse(inner.L)
    return RefinedSPDFactor(inner=inner, Linv=Linv, K_wide=K_adj,
                            iters=int(it), logdet_iters=int(ld_it))


def explicit_inverse(L32):
    """L^-1 materialized: ONE triangular solve (N-column RHS, a single
    custom call) instead of two latency-bound triangular solves inside
    every PCG iteration. The preconditioner is applied as the factored
    product L^-T (L^-1 r) — see _chol_apply for why NOT the collapsed
    fl(L^-T L^-1) matrix."""
    eye32 = jnp.eye(L32.shape[-1], dtype=L32.dtype)
    return solve_triangular(L32, eye32, lower=True)
