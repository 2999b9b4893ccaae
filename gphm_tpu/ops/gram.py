"""Gram-matrix assembly on difference matrices.

Replaces the reference's ``vmap``-over-N^2-scalars Gram builder
(reference: code/kernel_matrix.py:21-30) with a single broadcasted evaluation
of the kernel on the (N, M) signed-difference matrix, batched over the Q
mixture components. XLA fuses the mixture reduction, so no (N, M, Q)
intermediate is materialized in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gphm_tpu.ops import df32
from gphm_tpu.ops.kernels import StationaryKernel


def resolve_phase_exact(spec) -> bool:
    """Resolve the ``phase_exact`` config knob ('on'/'off'/'auto' or bool).

    Auto resolves to **off** (round 3). Rationale, measured on TPU v5e
    (tools/profile_numerics.py): the two-float compensated phase costs ~17%
    of the f32 training step (the round-2 bench regression, 1.28 -> 1.50
    ms/epoch at N=400/Q=30), while plain-f32 runs are *solve*-limited, not
    phase-limited — the f32 factorization error at the shipped conditioning
    (cond(K) ~ 1/jitter ~ 1e6, relative solve error O(cond * eps) ~ 6e-2)
    exceeds the worst-case phase error (|2 pi f tau| * eps ~ 1e-4 across
    every shipped config) by orders of magnitude; the round-1 full-budget
    f32 floors (5-8e-5 on the 1e5-epoch 1D configs) were reached with plain
    f32 phases. Every accuracy-critical tier (refined / mixed / float64)
    builds its training Grams at the wide f64 tier where the phase is exact
    regardless of this knob. 'on' remains available for plain-f32 runs of
    extreme-phase problems.
    """
    if isinstance(spec, str):
        s = spec.lower()
        if s in ("on", "true", "1"):
            return True
        if s in ("off", "false", "0"):
            return False
        if s == "auto":
            return False
        raise ValueError(f"phase_exact must be 'on'/'off'/'auto', got {spec!r}")
    return bool(spec)


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


def make_toeplitz_expand(N: int):
    """lag vector (2N-1,) -> Toeplitz matrix (N, N), with a scatter-free VJP.

    Forward is a plain gather K[i, j] = kv[(i - j) + N - 1] (fast on TPU).
    The *default* backward of a gather is a scatter-add, which TPU executes
    (de facto) serially: measured 12.9 ms per step for one f64 (N=400)
    Toeplitz gram inside a training scan, 2.3 ms in f32 — the single
    largest cost of both the refined and the f32 production steps. The
    custom backward computes the same lag cotangent as diagonal sums
    d_kv[l] = sum_i dK[i, i - l + N - 1] via pad + row-wise gather + column
    reduction — all fast TPU ops, no scatter anywhere.
    """
    i = np.arange(N)
    idx = jnp.asarray((i[:, None] - i[None, :]) + (N - 1), jnp.int32)
    lag = np.arange(2 * N - 1)
    # j(i, l) = i - l + (N-1); out-of-range j lands (mod 2N-1) in the
    # zero-padded column block [N, 2N-2] and contributes nothing
    ridx = jnp.asarray((i[:, None] - lag[None, :] + (N - 1)) % (2 * N - 1),
                       jnp.int32)

    @jax.custom_vjp
    def expand(kv):
        return jnp.take(kv, idx, axis=0)

    def fwd(kv):
        return expand(kv), None

    def bwd(_, dK):
        C = jnp.concatenate(
            [dK, jnp.zeros((N, N - 1), dK.dtype)], axis=1)
        B = jnp.take_along_axis(C, ridx, axis=1)
        return (jnp.sum(B, axis=0),)

    expand.defvjp(fwd, bwd)
    return expand


def toeplitz_lags(N: int, h: float, dtype):
    """The 2N-1 distinct signed differences tau_ij = (i - j) h of a uniform
    grid, and the (N, N) gather index matrix mapping lag -> position."""
    lags = jnp.asarray(np.arange(-(N - 1), N) * h, dtype)
    i = np.arange(N)
    idx = jnp.asarray((i[:, None] - i[None, :]) + (N - 1), jnp.int32)
    return lags, idx


class AxisGram:
    """One collocation axis's Gram builder, owning the difference
    representation at two accuracy tiers:

      * **train tier** — policy-dtype arrays; in float32 with
        ``phase_exact`` the lags/differences are carried as a two-float
        (hi, lo) pair so the mixture kernels evaluate with a compensated
        trig phase (ops/df32.py) — the dominant f32 Gram error for
        high-frequency problems — while storage and linear algebra stay f32;
      * **wide tier** — float64 lags/differences (when x64 is live), used by
        evaluation/prediction Grams so reported errors are honest: with
        f32-trained kernels the predict-time solve can hit
        cond(K) ~ 1/eps(f32) and misreport a correctly trained model.

    Uniform grids (every shipped reference config) use the Toeplitz lag
    representation: O(N Q) kernel evaluations + one structured gather
    instead of the reference's O(N^2 Q) pairwise pass
    (reference: code/kernel_matrix.py:21-30).
    """

    def __init__(self, x, dtype, *, x64=None, toeplitz="auto",
                 phase_exact: bool = True):
        x_arr = np.asarray(x)
        xd = np.asarray(x64, np.float64) if x64 is not None \
            else x_arr.astype(np.float64)
        self.N = int(xd.reshape(-1).size)
        xd = xd.reshape(-1)
        dtype = jnp.dtype(dtype)
        self.dtype = dtype
        self.phase_exact = bool(phase_exact) and dtype == jnp.float32
        wide_ok = bool(jax.config.jax_enable_x64)

        if toeplitz == "auto":
            # Toeplitz (O(NQ) lag evals + gather) wins on CPU, where
            # transcendentals dominate. On TPU the gather IS the bottleneck:
            # measured 8.35 ms/epoch vs 1.37 ms for the dense O(N^2 Q)
            # broadcast at N=400/Q=30 f32 (even with the scatter-free VJP) —
            # the VPU evaluates 4.8M kernel entries faster than the memory
            # system serves a 160k-element gather. So: lag representation on
            # CPU, dense differences on accelerators.
            toeplitz = jax.default_backend() == "cpu"
        h = uniform_spacing(xd) if toeplitz else None
        self.toeplitz = h is not None
        if self.toeplitz:
            lags64 = np.arange(-(self.N - 1), self.N) * h
            self.expand = make_toeplitz_expand(self.N)
            t64 = lags64
        else:
            self.expand = None
            t64 = xd[:, None] - xd[None, :]
        self.tau_train = (df32.from_f64(t64) if self.phase_exact
                          else jnp.asarray(t64, dtype))
        self.tau_wide = jnp.asarray(t64) if wide_ok else None

    def gram(self, kernel: StationaryKernel, params, *, deriv: int = 0,
             jitter: float = 0.0, wide: bool = False):
        """(N, N) covariance / derivative cross-covariance (+ jitter I)."""
        use_wide = wide and self.tau_wide is not None
        tau = self.tau_wide if use_wide else self.tau_train
        if use_wide:
            params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, self.tau_wide.dtype), params)
        kv = kernel.deriv(deriv)(tau, params)
        K = self.expand(kv) if self.toeplitz else kv
        if jitter:
            K = K + jitter * jnp.eye(self.N, dtype=K.dtype)
        return K


class CrossGram:
    """Rectangular test-vs-collocation cross-covariance with the same two
    accuracy tiers as AxisGram (reference preds cross-Gram:
    code/model_GP_solver_1d.py:172-178)."""

    def __init__(self, x1, x2, dtype, *, x1_64=None, x2_64=None,
                 phase_exact: bool = True):
        a = (np.asarray(x1_64, np.float64) if x1_64 is not None
             else np.asarray(x1).astype(np.float64)).reshape(-1)
        b = (np.asarray(x2_64, np.float64) if x2_64 is not None
             else np.asarray(x2).astype(np.float64)).reshape(-1)
        t64 = a[:, None] - b[None, :]
        dtype = jnp.dtype(dtype)
        self.phase_exact = bool(phase_exact) and dtype == jnp.float32
        self.tau_train = (df32.from_f64(t64) if self.phase_exact
                          else jnp.asarray(t64, dtype))
        self.tau_wide = (jnp.asarray(t64)
                         if jax.config.jax_enable_x64 else None)

    def eval(self, kernel: StationaryKernel, params, *, deriv: int = 0,
             wide: bool = False):
        use_wide = wide and self.tau_wide is not None
        tau = self.tau_wide if use_wide else self.tau_train
        if use_wide:
            params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, self.tau_wide.dtype), params)
        return kernel.deriv(deriv)(tau, params)


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
