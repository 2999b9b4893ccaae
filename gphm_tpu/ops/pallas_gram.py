"""Fused Pallas Gram-pair construction for TPU.

The hot op of every GP-HM training step is building the covariance matrix K
and its derivative cross-covariance K_d (d2 for Poisson/Allen-Cahn, d1 for
advection) over the same N x N difference matrix — O(N^2 Q) transcendental
work. The XLA path (ops/gram.py) broadcasts over a (N, N, Q) intermediate and
reduces; this module fuses everything into one VMEM-resident Pallas kernel:

  * one (TM, TN) tile of tau is formed once per grid step,
  * the Q mixture components are accumulated in registers (fori_loop over
    scalar params prefetched to SMEM),
  * the shared subexpressions (exp, cos, sin of the same arguments) feed both
    the K and the K_d accumulators — the XLA path evaluates them twice,
  * both outputs are written from the same pass (2 N^2 writes, N reads).

A custom VJP computes the (Q,)-shaped parameter gradients through the
broadcasted XLA formulation, whose (Q,) reductions fuse into the term
computation (nothing (N, N, Q)-shaped hits HBM). Gradients flow to the
mixture parameters only — tau is constant collocation geometry in every
solver (reference: code/model_GP_solver_1d.py:86-97).

Supported kernels: SE_Cos (GP-HM-GM) and Matern52_Cos (GP-HM-Stm) — the two
spectral-mixture kernels the paper benchmarks; the plain SE / Matern52
baselines are their c == 0 special case and reuse the same kernels.

Status: measured on TPU v5e (N=400, Q=30, inside the training scan) this
kernel is runtime-identical to the XLA broadcast path — XLA fuses the
mixture reduction, so the fusion this kernel hand-codes already happens —
while Mosaic compilation is ~25x slower under this environment's remote
compiler. Solvers therefore default to the XLA path; enable with
config['use_pallas']=True (it stays bit-validated by tests/test_pallas_gram).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT5 = 5.0 ** 0.5


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _se_terms(tau, w, g, c):
    """Shared per-component terms for SE_Cos: K term and d1/d2 terms."""
    E = jnp.exp(-(tau * tau) * g)
    ct = c * tau
    C = jnp.cos(ct)
    S = jnp.sin(ct)
    k = w * E * C
    d1 = -w * E * (2.0 * g * tau * C + c * S)
    d2 = w * E * ((4.0 * g * g * tau * tau - 2.0 * g - c * c) * C
                  + 4.0 * g * tau * c * S)
    return k, d1, d2


def _m52_terms(tau, w, a, c):
    """Shared per-component terms for Matern52_Cos."""
    d = jnp.abs(tau)
    rd = _SQRT5 * a * d
    E = jnp.exp(-rd)
    m = (1.0 + rd + (5.0 / 3.0) * (a * a) * (d * d)) * E
    mp = -(5.0 / 3.0) * (a * a) * d * (1.0 + rd) * E
    mpp = -(5.0 / 3.0) * (a * a) * (1.0 + rd - 5.0 * (a * a) * (d * d)) * E
    cd = c * d
    C = jnp.cos(cd)
    S = jnp.sin(cd)
    k = w * m * C
    d1 = w * (mp * C - c * m * S) * jnp.sign(tau)
    d2 = w * (mpp * C - 2.0 * c * mp * S - c * c * m * C)
    return k, d1, d2


_TERMS = {"se_cos": _se_terms, "matern52_cos": _m52_terms}


def _fwd_kernel(wg_ref, ls_ref, fr_ref, x1_ref, x2_ref, k_ref, kd_ref, *,
                Q: int, family: str, deriv: int):
    tau = x1_ref[:] - x2_ref[:]          # (TM, TN) via broadcast
    terms = _TERMS[family]

    def body(q, accs):
        acc_k, acc_d = accs
        w = wg_ref[q]
        s = ls_ref[q]
        c = fr_ref[q]
        k, d1, d2 = terms(tau, w, s, c)
        return acc_k + k, acc_d + (d1 if deriv == 1 else d2)

    zero = jnp.zeros_like(tau)
    acc_k, acc_d = jax.lax.fori_loop(0, Q, body, (zero, zero))
    k_ref[:] = acc_k
    kd_ref[:] = acc_d


def _jnp_gram_pair(spec, x12, params3):
    """Broadcasted XLA reference implementation (used for the VJP and as the
    numerical oracle in tests)."""
    family, Q, deriv = spec
    x1, x2 = x12
    w, s, c = params3
    tau = (x1[:, None] - x2[None, :])[..., None]  # (N1, N2, Q) via broadcast
    k, d1, d2 = _TERMS[family](tau, w, s, c)
    kd = d1 if deriv == 1 else d2
    return k.sum(-1), kd.sum(-1)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def _tiles(n1, n2):
    TM = min(256, max(8, _cdiv(n1, _cdiv(n1, 256))))
    TN = 128 if n2 >= 128 else n2
    # round TM to sublane multiple of 8
    TM = max(8, (TM // 8) * 8)
    return TM, TN


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def gram_pair(spec: Tuple, x12, params3):
    """Fused (K, K_deriv) Gram pair.

    spec   = (family, Q, deriv) — static.
    x12    = (x1, x2) 1-D point arrays (constant geometry; no gradient).
    params3 = (w, scale, cfreq) with w = exp(log-w), scale = exp(log-ls),
              cfreq = 2*pi*freq — precomputed so VJP maps cleanly onto the
              mixture parametrization.
    """
    return _gram_pair_fwd_impl(spec, x12, params3)


def _gram_pair_fwd_impl(spec, x12, params3):
    family, Q, deriv = spec
    x1, x2 = x12
    w, s, c = params3
    n1, n2 = x1.shape[0], x2.shape[0]
    TM, TN = _tiles(n1, n2)
    grid = (_cdiv(n1, TM), _cdiv(n2, TN))

    kernel = functools.partial(_fwd_kernel, Q=Q, family=family, deriv=deriv)
    out_shape = [jax.ShapeDtypeStruct((n1, n2), x1.dtype)] * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # w, s, c live in SMEM
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, *_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, TN), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TN), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
        ],
    )
    flops_per = 30 if family == "matern52_cos" else 22
    K, Kd = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=flops_per * n1 * n2 * Q,
            bytes_accessed=(n1 + n2 + 2 * n1 * n2) * x1.dtype.itemsize,
            transcendentals=3 * n1 * n2 * Q),
    )(w, s, c, x1.reshape(n1, 1), x2.reshape(1, n2))
    return K, Kd


def _gram_pair_fwd(spec, x12, params3):
    out = _gram_pair_fwd_impl(spec, x12, params3)
    return out, (x12, params3)


def _gram_pair_bwd(spec, res, cotangents):
    """Parameter cotangents via the XLA reference formulation — the (Q,)
    reductions fuse into the broadcasted terms, so nothing (N, N, Q)-shaped
    is materialized. The collocation geometry gets no gradient."""
    x12, params3 = res
    _, vjp_fn = jax.vjp(lambda p3: _jnp_gram_pair(spec, x12, p3), params3)
    (dparams3,) = vjp_fn(cotangents)
    return jax.tree_util.tree_map(jnp.zeros_like, x12), dparams3


gram_pair.defvjp(_gram_pair_fwd, _gram_pair_bwd)


# ---------------------------------------------------------------------------
# solver-facing wrapper
# ---------------------------------------------------------------------------

_FAMILY_OF = {
    "SE_Cos_1d": "se_cos",
    "SE_1d": "se_cos",               # c == 0 special case
    "Matern52_Cos_1d": "matern52_cos",
    "Matern52_1d": "matern52_cos",   # c == 0 special case
}


def supports(kernel_name: str) -> bool:
    return kernel_name in _FAMILY_OF


def gram_pair_from_params(kernel_name: str, x, params, *, deriv: int = 2,
                          jitter: float = 0.0):
    """K (+ jitter I) and K_deriv from the solver's parameter pytree."""
    family = _FAMILY_OF[kernel_name]
    w = jnp.exp(params["log-w"])
    s = jnp.exp(params["log-ls"])
    if "freq" in params and family.endswith("cos"):
        c = 2.0 * np.pi * params["freq"]
    else:
        c = jnp.zeros_like(w)
    Q = int(w.shape[0])
    K, Kd = gram_pair((family, Q, deriv), (x, x), (w, s, c))
    if jitter:
        K = K + jitter * jnp.eye(x.shape[0], dtype=K.dtype)
    return K, Kd
