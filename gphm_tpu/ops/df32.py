"""Two-float (double-word float32) compensated arithmetic.

TPU hardware has no fast float64: on this class of device f64 is software
emulation, and dense f64 factorizations crash the hot loop outright
(PARITY.md numerics notes). The reference, however, leans on float64
(reference: code/kernel_matrix.py:6-7) — with jitter 1e-6 and solutions like
``sin(500 x)`` its accuracy genuinely needs more than 24 mantissa bits in two
places:

  * the **trig phase** of the spectral-mixture kernels: theta = 2 pi f d
    reaches O(10^3) radians, so a plain f32 evaluation carries an absolute
    phase error of ~|theta| * eps(f32) ~ 1e-4 into every Gram entry (and,
    scaled by (2 pi f)^2, into the derivative cross-covariances that form the
    PDE residual);
  * the **factorization/solve** of K with cond(K) up to ~1/jitter.

This module provides the error-free transformations (Dekker/Knuth) on f32
pairs ``(hi, lo)`` with ``hi + lo`` representing the value to ~48 mantissa
bits, plus the phase-accurate cosine/sine used by the kernel layer. All ops
are branch-free elementwise JAX functions: they jit, vmap, and differentiate
(AD treats the compensation terms as ordinary arithmetic; their derivatives
telescope to the correct value derivative).

XLA note: error-free transforms like ``(a + b) - a`` survive XLA because its
algebraic simplifier does not apply unsafe floating-point rewrites. That is
load-bearing — ``eft_selfcheck()`` verifies it at runtime on the actual
backend and is exercised by the test suite (and on TPU by tools/).
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np


class TwoFloat(NamedTuple):
    """A value represented as an unevaluated sum hi + lo, |lo| <= ulp(hi)/2."""

    hi: jax.Array
    lo: jax.Array

    @property
    def dtype(self):
        return self.hi.dtype

    @property
    def shape(self):
        return self.hi.shape

    def __getitem__(self, idx):  # slicing/broadcast helpers (tau[..., None])
        return TwoFloat(self.hi[idx], self.lo[idx])

    def value64(self):
        """f64 view for host-side validation (needs x64)."""
        return self.hi.astype(jnp.float64) + self.lo.astype(jnp.float64)


TauLike = Union[jax.Array, TwoFloat]

# Dekker split constant for f32: 2^12 + 1 (24-bit mantissa -> 12+12).
_SPLIT_F32 = 4097.0


def two_sum(a, b):
    """Error-free a + b = s + err (Knuth; 6 flops, no branch)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def fast_two_sum(a, b):
    """Error-free a + b = s + err assuming |a| >= |b| (Dekker; 3 flops)."""
    s = a + b
    err = b - (s - a)
    return s, err


def split(a):
    """Dekker split: a = hi + lo with hi, lo on 12 mantissa bits each."""
    c = _SPLIT_F32 * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b = p + err via Dekker splitting (no FMA on the VPU)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


# ---------------------------------------------------------------------------
# double-word operations
# ---------------------------------------------------------------------------

def tf(x) -> TwoFloat:
    """Promote an f32 array (exact) to a TwoFloat."""
    x = jnp.asarray(x)
    return TwoFloat(x, jnp.zeros_like(x))


def from_f64(x, dtype=jnp.float32) -> TwoFloat:
    """Split a float64 numpy/host value into a TwoFloat (exactly)."""
    x64 = np.asarray(x, np.float64)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return TwoFloat(jnp.asarray(hi, dtype), jnp.asarray(lo, dtype))


def add(x: TwoFloat, y: TwoFloat) -> TwoFloat:
    """Accurate double-word addition (~eps^2 relative)."""
    s1, s2 = two_sum(x.hi, y.hi)
    t1, t2 = two_sum(x.lo, y.lo)
    s2 = s2 + t1
    s1, s2 = fast_two_sum(s1, s2)
    s2 = s2 + t2
    return TwoFloat(*fast_two_sum(s1, s2))


def add_f(x: TwoFloat, y) -> TwoFloat:
    s1, s2 = two_sum(x.hi, y)
    s2 = s2 + x.lo
    return TwoFloat(*fast_two_sum(s1, s2))


def neg(x: TwoFloat) -> TwoFloat:
    return TwoFloat(-x.hi, -x.lo)


def sub(x: TwoFloat, y: TwoFloat) -> TwoFloat:
    return add(x, neg(y))


def mul(x: TwoFloat, y: TwoFloat) -> TwoFloat:
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return TwoFloat(*fast_two_sum(p, e))


def mul_f(x: TwoFloat, y) -> TwoFloat:
    """TwoFloat times an exact f32 array."""
    p, e = two_prod(x.hi, y)
    e = e + x.lo * y
    return TwoFloat(*fast_two_sum(p, e))


def abs_(x: TwoFloat) -> TwoFloat:
    s = jnp.sign(x.hi)
    # sign(0) == 0 zeroes lo on the diagonal of difference matrices, where
    # lo is 0 anyway (exact zero difference)
    return TwoFloat(jnp.abs(x.hi), x.lo * s)


# ---------------------------------------------------------------------------
# phase-accurate trigonometry for the spectral-mixture kernels
# ---------------------------------------------------------------------------

_TWO_PI = from_f64(2.0 * np.pi)


def cos_sin_2pi(d: TwoFloat, freq):
    """cos/sin of 2 pi * freq * d with double-word phase handling.

    ``freq`` is an exact f32 array (the trained mixture frequencies,
    reference params 'freq': code/model_GP_solver_1d.py:206-210); ``d`` is a
    double-word difference/lag. The product y = freq * d is formed
    error-free, range-reduced by the nearest integer (exact Sterbenz
    subtraction), and the residual phase theta = 2 pi frac(y) is evaluated
    as cos(hi) -+ lo * sin(hi) — a first-order correction that leaves
    ~eps(f32) total error instead of ~|theta_full| * eps.

    Differentiable: jnp.round is piecewise constant (zero gradient), so
    d/dfreq passes through the fractional part exactly as it should.
    """
    y, ye = two_prod(d.hi, freq)
    ye = ye + d.lo * freq
    n = jnp.round(y)
    r = TwoFloat(*two_sum(y - n, ye))     # y - n exact (|y - n| <= 1/2)
    th = mul(_TWO_PI, r)                  # |th| <= pi + eps
    c, s = jnp.cos(th.hi), jnp.sin(th.hi)
    return c - th.lo * s, s + th.lo * c


def eft_selfcheck() -> bool:
    """True iff the error-free transforms survive compilation on the current
    backend (i.e. XLA did not simplify away the compensation terms). Run on
    every new backend before trusting the df32 paths."""

    @jax.jit
    def probe():
        a = jnp.float32(1.0)
        b = jnp.float32(3e-8)           # below ulp(1)/2: lost by plain f32 add
        s, e = two_sum(a, b)
        p, pe = two_prod(jnp.float32(1.0 + 2.0 ** -12),
                         jnp.float32(1.0 + 2.0 ** -12))
        return s, e, p, pe

    s, e, p, pe = map(float, probe())
    ok_sum = (s == 1.0) and (e == float(np.float32(3e-8)))
    # (1 + 2^-12)^2 = 1 + 2^-11 + 2^-24: the 2^-24 term must land in pe
    ok_prod = (p == float(np.float32(1.0 + 2.0 ** -11))) and (pe != 0.0)
    return bool(ok_sum and ok_prod)
