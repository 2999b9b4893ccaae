"""Precision policy for TPU-first execution.

The reference globally enables float64 (reference: code/kernel_matrix.py:6-7)
and runs on CPU. TPU f64 is emulated and extremely slow, so the framework is
parameterized by a precision policy instead:

  * ``float64`` — bit-compatible validation mode (CPU, and tests).
  * ``float32`` — TPU production mode. Matmuls are forced to `highest`
    precision so the MXU does not silently truncate to bf16; SPD solves use
    Cholesky (better conditioned than the reference's LU + slogdet pair) and
    adaptive jitter escalation compensates for the narrower mantissa.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Compute/solve dtype policy threaded through kernels, solvers, linalg."""

    dtype: Any = jnp.float32
    # When set (e.g. float64 with dtype float32 = "mixed" mode), Cholesky
    # factorizations, triangular solves, and log-determinants run in this
    # wider dtype while Gram construction and the optimizer stay in `dtype`.
    # Targets the f32 failure mode where cond(K) ~ 1/jitter ~ 1e6 makes the
    # f32 solve error O(10%) while the Gram entries themselves are benign.
    solve_dtype: Any = None
    # jax.lax matmul precision for f32 on the MXU ('highest' = full f32 via
    # multi-pass bf16; essential for Gram/solve accuracy at N in the hundreds).
    matmul_precision: str = "highest"
    # Base diagonal jitter (reference uses 1e-6 everywhere,
    # reference: code/model_GP_solver_1d.py:365).
    jitter: float = 1e-6
    # Multiplicative escalation factor when a Cholesky factorization produces
    # non-finite values (aux robustness absent from the reference; SURVEY §5).
    jitter_growth: float = 100.0
    max_jitter_tries: int = 3
    # > 0 enables the refined tier ("dtype: refined" in configs): Grams are
    # built at the wide (f64) tier, factored in fast native float32, and
    # solves run this many f64 PCG iterations preconditioned by the f32
    # factor — ~f64 forward error at ~f32 cost (ops/refined.py). The
    # TPU-native answer to the reference's global float64
    # (reference: code/kernel_matrix.py:6-7). 8 reaches the f64 floor at
    # the production conditioning (cond ~ 1e7).
    refine_iters: int = 0
    # PCG iterations for the logdet *gradient* (None = refine_iters). The
    # logdet gradient is the only matrix-RHS PCG in a refined step (K^-1 on
    # the identity: measured 34 of 52 ms at N=400); 0 uses the f32-factor
    # inverse instead — the logdet term is a smooth regularizer, so its
    # gradient tolerates f32 accuracy while the data-fit terms stay refined.
    refine_logdet_iters: Any = None

    def cast(self, x):
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, self.dtype) if jnp.issubdtype(
                jnp.asarray(a).dtype, jnp.floating) else jnp.asarray(a), x)

    def activate(self) -> "Policy":
        """Apply the process-level knobs the policy implies (idempotent).

        Sets JAX's default matmul precision: without this, f32 `dot`s on the
        MXU run at the backend default (bf16 passes), which silently degrades
        the derivative lifts K_d @ K^-1 u, the Kronecker contractions, and
        the triangular-solve blocks. Called by every solver constructor so
        no entry point (CLI, bench, graft entry, tools) can skip it.
        """
        jax.config.update("jax_default_matmul_precision",
                          self.matmul_precision)
        return self


def default_policy() -> Policy:
    """float64 when x64 is enabled (CPU validation), float32 otherwise (TPU)."""
    if jax.config.jax_enable_x64:
        return Policy(dtype=jnp.float64)
    return Policy(dtype=jnp.float32)
