"""Manufactured-solution problem registry.

All 12 reference equations (reference: code/model_GP_solver_1d.py:313-332,
code/model_GP_solver_2d.py:385-396, code/model_GP_solver_advection.py:385-388)
with source terms derived from the analytic solution **by autodiff** exactly as
the reference does (code/model_GP_solver_1d.py:299-307, _2d.py:355-366,
_advection.py:354-362) — the manufactured solution is the correctness oracle
(relative L2 on a held-out 300 / 300^2 grid).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Analytic solutions
# ---------------------------------------------------------------------------

EQUATIONS_1D: Dict[str, Callable] = {
    "poisson_1d-mix_sin":
        lambda x: jnp.sin(x) + 0.1 * jnp.sin(20 * x) + 0.05 * jnp.sin(100 * x),
    "poisson_1d-single_sin":
        lambda x: jnp.sin(100 * x),
    "poisson_1d-sin_cos":
        lambda x: jnp.sin(6 * x) * jnp.cos(100 * x),
    "poisson_1d-x_time_sinx":
        lambda x: x * jnp.sin(200 * x),
    "poisson_1d-x2_add_sinx":
        lambda x: jnp.sin(500 * x) - 2 * (x - 0.5) ** 2,
    "allencahn_1d-sin_cos":
        lambda x: jnp.sin(6 * x) * jnp.cos(100 * x),
    "allencahn_1d-single_sin":
        lambda x: jnp.sin(100 * x),
    "poisson_1d-x_time_sinx_scale":
        lambda x: x * jnp.sin(200 * x * np.pi),
}

EQUATIONS_2D: Dict[str, Callable] = {
    "poisson_2d-sin_sin":
        lambda x, y: jnp.sin(100 * x) * jnp.sin(100 * y),
    "poisson_2d-sin_cos":
        lambda x, y: jnp.sin(100 * x) * jnp.cos(100 * y),
    "poisson_2d-sin_add_cos":
        lambda x, y: jnp.sin(6 * x) * jnp.cos(20 * x)
        + jnp.sin(6 * y) * jnp.cos(20 * y),
    "allencahn_2d-mix-sincos":
        lambda x, y: (jnp.sin(x) + 0.1 * jnp.sin(20 * x) + jnp.cos(100 * x))
        * (jnp.sin(y) + 0.1 * jnp.sin(20 * y) + jnp.cos(100 * y)),
    # beyond-reference: 2D analog of poisson_1d-x2_add_sinx — a high
    # frequency line on a smooth polynomial trend whose source contribution
    # (u_xx + u_yy = -8) is ~4e-4 of the line's 2e4 amplitude, i.e. below
    # the learned residual noise floor. Exercises the separable 2D
    # polynomial mean function (mean_poly; models/solver_2d.py).
    "poisson_2d-x2y2_add_sinsin":
        lambda x, y: (jnp.sin(100 * x) * jnp.sin(100 * y)
                      - 2 * (x - 0.5) ** 2 - 2 * (y - 0.5) ** 2),
}


def make_advection_solution(beta: float) -> Callable:
    """advection-sin: u(x, t) = sin(x - beta t)
    (reference: code/model_GP_solver_advection.py:385-388)."""
    return lambda x, y: jnp.sin(x - beta * y)


# ---------------------------------------------------------------------------
# Source terms by autodiff of the analytic solution
# ---------------------------------------------------------------------------

def source_1d(u: Callable, x_vec, eq_type: str):
    """f = u_xx (Poisson) or u_xx + u(u^2-1) (Allen-Cahn)
    (reference: code/model_GP_solver_1d.py:299-307)."""
    uxx = jax.vmap(jax.grad(jax.grad(u)))(x_vec)
    if eq_type == "poisson_1d":
        return uxx
    if eq_type == "allencahn_1d":
        return uxx + u(x_vec) * (u(x_vec) ** 2 - 1)
    raise ValueError(f"unknown 1d equation type {eq_type!r}")


def source_2d(u: Callable, x_pos, y_pos, eq_type: str, beta: float = 0.0):
    """2D sources on the meshgrid, N1 x N2
    (reference: code/model_GP_solver_2d.py:355-366, _advection.py:354-362)."""
    xm, ym = jnp.meshgrid(jnp.asarray(x_pos), jnp.asarray(y_pos),
                          indexing="ij")
    xv, yv = xm.reshape(-1), ym.reshape(-1)
    d2x = jax.vmap(jax.grad(jax.grad(u, 0), 0))(xv, yv)
    if eq_type == "poisson_2d":
        d2y = jax.vmap(jax.grad(jax.grad(u, 1), 1))(xv, yv)
        src = d2x + d2y
    elif eq_type == "allencahn_2d":
        d2y = jax.vmap(jax.grad(jax.grad(u, 1), 1))(xv, yv)
        uv = u(xv, yv)
        src = d2x + d2y + uv * (uv ** 2 - 1)
    elif eq_type == "advection":
        dx = jax.vmap(jax.grad(u, 0))(xv, yv)
        dy = jax.vmap(jax.grad(u, 1))(xv, yv)
        src = beta * dx + dy
    else:
        raise ValueError(f"unknown 2d equation type {eq_type!r}")
    return src.reshape(len(x_pos), len(y_pos))


def boundary_values_2d(U_grid):
    """Four grid edges, reference order [top, bottom, left, right]
    (reference: code/model_GP_solver_2d.py:377-379)."""
    return jnp.hstack((U_grid[0, :], U_grid[-1, :], U_grid[:, 0],
                       U_grid[:, -1]))


# ---------------------------------------------------------------------------
# Assembled problems
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Problem1D:
    """1D collocation problem: boundary = the two endpoints of X_col
    (reference: code/model_GP_solver_1d.py:336-354).

    ``X_col64``/``X_test64`` are the authoritative float64 numpy grids the
    cast arrays were derived from. Solvers use them for uniform-spacing
    detection (dtype-independent — the cast grid's diffs vary at ~N*eps and
    defeated the Toeplitz fast path in f32), for exact Toeplitz lags, and
    for the widened (f64 / two-float) evaluation and hot-loop Gram paths.
    """

    equation: str
    eq_type: str
    X_col: jax.Array      # (N_col,)
    bc_idx: jax.Array     # (2,) indices into X_col
    bc_vals: jax.Array    # (2,)
    src: jax.Array        # (N_col,)
    X_test: jax.Array     # (M,)
    u_test: jax.Array     # (M,)
    X_col64: np.ndarray = None
    X_test64: np.ndarray = None
    # authoritative wide source term (the values are O((2 pi f)^2) for
    # high-frequency solutions, so their f32 cast carries ~0.01 absolute
    # rounding — the refined tier computes residuals against this copy)
    src64: jax.Array = None

    @property
    def solution(self) -> Callable:
        return EQUATIONS_1D[self.equation]


@dataclasses.dataclass(frozen=True)
class Problem2D:
    """2D grid collocation problem; boundary = the four grid edges."""

    equation: str
    eq_type: str
    x_col: jax.Array      # (N1,)
    y_col: jax.Array      # (N2,)
    bc_vals: jax.Array    # (2*N1 + 2*N2,)
    src: jax.Array        # (N1, N2)
    x_test: jax.Array     # (M,)
    y_test: jax.Array     # (M,)
    u_test: jax.Array     # (M, M)
    beta: float = 0.0
    x_col64: np.ndarray = None
    y_col64: np.ndarray = None
    x_test64: np.ndarray = None
    y_test64: np.ndarray = None
    src64: jax.Array = None  # wide source (see Problem1D.src64)


def make_problem(equation: str, N_col: int, scale: float, *, M: int = 300,
                 beta: float = 0.0, dtype=jnp.float64):
    """Build the test grid, collocation grid, boundary data, and autodiff
    source for any registered equation (1D or 2D).

    Grids, analytic solutions, and autodiff sources are always *computed* in
    float64 (when x64 is live) and only then cast to ``dtype``: in f32 mode
    the source term of a high-frequency solution (e.g. u_xx = -2.5e5 sin 500x)
    would otherwise carry f32 trig argument-reduction noise into the data
    itself. The float64 numpy grids ride along on the problem (``*_64``
    fields) for the solvers' exact-lag / widened-eval paths.
    """
    eq_type = equation.split("-")[0]

    if equation in EQUATIONS_1D:
        u = EQUATIONS_1D[equation]
        X_test64 = np.linspace(0, 1, M) * scale
        X_col64 = np.linspace(0, 1, N_col) * scale
        Xc = jnp.asarray(X_col64)   # f64 when x64 is enabled
        Xt = jnp.asarray(X_test64)
        bc_idx = jnp.array([0, N_col - 1])
        src_w = source_1d(u, Xc, eq_type)
        return Problem1D(
            equation=equation, eq_type=eq_type,
            X_col=Xc.astype(dtype), bc_idx=bc_idx,
            bc_vals=jnp.stack([u(Xc[0]), u(Xc[-1])]).astype(dtype),
            src=src_w.astype(dtype),
            X_test=Xt.astype(dtype), u_test=u(Xt).astype(dtype),
            X_col64=X_col64, X_test64=X_test64, src64=src_w)

    if eq_type == "advection":
        u = make_advection_solution(beta)
    elif equation in EQUATIONS_2D:
        u = EQUATIONS_2D[equation]
    else:
        raise KeyError(f"unknown equation {equation!r}")

    x_col64 = np.linspace(0, 1, N_col) * scale
    y_col64 = np.linspace(0, 1, N_col) * scale
    x_test64 = np.linspace(0, 1, M) * scale
    y_test64 = np.linspace(0, 1, M) * scale
    x_col, y_col = jnp.asarray(x_col64), jnp.asarray(y_col64)
    x_test, y_test = jnp.asarray(x_test64), jnp.asarray(y_test64)

    xm, ym = jnp.meshgrid(x_col, y_col, indexing="ij")
    U_grid = u(xm, ym)
    xt, yt = jnp.meshgrid(x_test, y_test, indexing="ij")

    src_w = source_2d(u, x_col, y_col, eq_type, beta)
    return Problem2D(
        equation=equation, eq_type=eq_type,
        x_col=x_col.astype(dtype), y_col=y_col.astype(dtype),
        bc_vals=boundary_values_2d(U_grid).astype(dtype),
        src=src_w.astype(dtype),
        x_test=x_test.astype(dtype), y_test=y_test.astype(dtype),
        u_test=u(xt, yt).astype(dtype), beta=beta,
        x_col64=x_col64, y_col64=y_col64,
        x_test64=x_test64, y_test64=y_test64, src64=src_w)
