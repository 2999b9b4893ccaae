"""Polynomial mean-function basis for GP-HM solvers (universal kriging).

A GP with an explicit low-order polynomial trend,

    u(x) = h(x)' beta + g(x),     g ~ GP(0, K_theta),

is the principled fix for the measured smooth-mode error floor on
multi-scale sources: on ``poisson_1d-x2_add_sinx`` (u = sin(500x) -
2(x-1/2)^2, reference: code/model_GP_solver_1d.py:330) the trained mixture
captures the 500-rad spectral line to ~7e-5 relative while the *parabola*
carries the remaining ~5e-3 — its source contribution (u_xx = -4) is 1.6e-5
of the line's 2.5e5 amplitude, far below the learned residual noise floor,
so no amount of extra training recovers it (trough-checkpoint FFT analysis,
round 2).  The trend coefficients ``beta`` enter every likelihood term
linearly and are profiled (or trained) jointly with the latent, so the
smooth component is fitted exactly with no noise-floor coupling.

The reference has no mean-function support; its ad-hoc counterpart is the
two-GP trick (code/model_GP_solver_1d_extra.py), which fits the smooth
residual with a *second kernel* and a phase-switch schedule.

Basis: monomials in the affinely mapped coordinate t = 2(x-a)/(b-a) - 1
(t in [-1, 1] keeps the Vandermonde conditioned for the small degrees that
matter here; degree <= ~6).  First/second derivatives are analytic with the
chain-rule factor (2/(b-a))^k.
"""

from __future__ import annotations

import numpy as np


def poly_basis(x: np.ndarray, degree: int, domain=None):
    """Monomial basis on the mapped coordinate and its x-derivatives.

    Returns float64 numpy arrays ``(H, Hd, Hdd)``, each ``(len(x), degree+1)``
    with columns j = 0..degree:

        H[:, j]   = t^j
        Hd[:, j]  = d/dx   t^j = j t^(j-1) * s
        Hdd[:, j] = d^2/dx^2 t^j = j (j-1) t^(j-2) * s^2,   s = 2/(b-a).

    ``domain`` defaults to (x.min(), x.max()); pass the collocation domain
    explicitly when evaluating on a test grid so both share one map.
    """
    x = np.asarray(x, np.float64).reshape(-1)
    if degree < 0:
        raise ValueError(f"degree must be >= 0, got {degree}")
    a, b = (float(x.min()), float(x.max())) if domain is None else domain
    if not b > a:
        raise ValueError(f"degenerate domain [{a}, {b}]")
    s = 2.0 / (b - a)
    t = (x - a) * s - 1.0
    n, p = x.shape[0], degree + 1
    H = np.empty((n, p))
    Hd = np.zeros((n, p))
    Hdd = np.zeros((n, p))
    H[:, 0] = 1.0
    for j in range(1, p):
        H[:, j] = t ** j
        Hd[:, j] = j * t ** (j - 1) * s
        if j >= 2:
            Hdd[:, j] = j * (j - 1) * t ** (j - 2) * s * s
    return H, Hd, Hdd
