"""Tracing / profiling.

The reference's only instrumentation is a wall-clock around the fold loop
and a tqdm bar (reference: code/model_GP_solver_1d.py:359,381-388,234;
SURVEY §5). Here:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing
    TensorBoard-loadable device traces of the training scan.
  * ``PhaseTimer`` — lightweight host-side phase timing (build/compile/train/
    eval) with a summary table.
  * ``step_flops_*`` — analytic FLOP models of the training step so
    benchmarks can report achieved TFLOP/s for the Gram + Cholesky pipeline
    (the BASELINE.md "Gram/Cholesky TFLOP/s" metric).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace if a logdir is given, else a no-op."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    def __init__(self):
        self.phases: Dict[str, float] = {}
        self._open: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) \
                + (time.time() - t0)

    def summary(self) -> str:
        total = sum(self.phases.values()) or 1.0
        lines = [f"{name:>12s}: {dt:8.3f} s ({dt / total * 100:4.1f}%)"
                 for name, dt in sorted(self.phases.items(),
                                        key=lambda kv: -kv[1])]
        return "\n".join(lines)


def gram_flops(N: int, Q: int, kernel: str = "matern52_cos") -> int:
    """Approximate FLOPs to build one N x N Gram matrix with Q mixture
    components (transcendentals counted as one op each)."""
    per_term = 30 if "matern" in kernel else 22
    return per_term * N * N * Q


def cholesky_flops(N: int) -> int:
    return N ** 3 // 3


def step_flops_1d(N: int, Q: int, kernel: str = "matern52_cos") -> int:
    """Forward FLOPs of one 1D training step: two Gram builds (K, K_dxx),
    one Cholesky, two triangular solves (1 rhs), one N^2 matvec. Reverse
    mode roughly doubles this; we report forward-only, conservatively."""
    return (2 * gram_flops(N, Q, kernel) + cholesky_flops(N)
            + 2 * N * N + 2 * N * N)


def step_flops_2d(N1: int, N2: int, Q: int,
                  kernel: str = "matern52_cos") -> int:
    """One 2D step: per-dimension Gram pairs + Cholesky factors + solves
    with grid-wide right-hand sides + two derivative-lift matmuls."""
    solves = 2 * (N1 * N1 * N2 + N2 * N2 * N1)   # tri solves, N2/N1 rhs
    lifts = 2 * (N1 * N1 * N2 + N2 * N2 * N1)    # Kd @ Kinv_U matmuls
    return (2 * gram_flops(N1, Q, kernel) + 2 * gram_flops(N2, Q, kernel)
            + cholesky_flops(N1) + cholesky_flops(N2) + solves + lifts)
