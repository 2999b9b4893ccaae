"""gphm_tpu — TPU-native Gaussian-process solver for high-frequency & multi-scale PDEs.

A from-scratch JAX/XLA re-design of the GP-HM method (ICLR 2024,
"Solving High Frequency and Multi-Scale PDEs with Gaussian Processes";
reference implementation: xuangu-fang/Gaussian-Process-Slover-for-High-Freq-PDE).

Capabilities (reference parity, built TPU-first):
  * spectral-mixture kernels (SE x cos, Matern5/2 x cos) and plain SE / Matern5/2
    baselines with the full derivative cross-covariance surface
    (reference: code/kernel_matrix.py) — here as closed-form batched expressions
    on difference matrices instead of vmap-over-N^2 scalar autodiff.
  * collocation-based MAP inference of the log-joint (GP prior + boundary +
    PDE-residual Gaussian likelihoods) for 1D Poisson / Allen-Cahn, 2D Poisson /
    Allen-Cahn with Kronecker-product kernel structure, and 2D advection
    (reference: code/model_GP_solver_{1d,2d,advection,1d_extra}.py).
  * two-GP residual ("extra GP") trick for hard multi-scale 1D problems.
  * Cholesky-based SPD solve path with factor reuse (logdet + solves from one
    factorization), robust jitter escalation, and a CG + Kronecker-matvec path
    that scales past dense-factorization limits.
  * fully jitted lax.scan training loops, mesh-sharded (pjit/shard_map)
    multi-device execution, structured metrics, checkpoints, and diagnostics.
"""

__version__ = "0.1.0"

from gphm_tpu.precision import Policy, default_policy  # noqa: F401
