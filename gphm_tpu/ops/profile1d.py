"""Whitened-coordinate conditional optima for 1D profiled-latent training.

Profiled-latent mode (``u_mode='profiled'``) replaces the reference's
1e5-1e6-epoch Adam descent on the latent u (reference:
code/model_GP_solver_1d.py:151-158) with the conditional optimum of the MAP
objective at each hyperparameter step.  This module computes that optimum in
*whitened* coordinates ut, where u = K ut:

  * Linear residual (Poisson): the objective is an SPD quadratic; one solve
        S ut = wt K (m.b) + v Kd' f,
        S = K + wt K diag(m) K + v Kd' Kd
    gives the exact optimum.  S is built from matmuls only (no explicit
    K^-1), so it rides the MXU and stays as well-conditioned as the problem
    allows (cond(S) ~ cond(K)^2).

  * Cubic residual (Allen-Cahn): damped Gauss-Newton on the same SPD form.
    With residual r(ut) = Kd ut + phi(shift + K ut) - f, each iteration
    solves the GN normal equations with Jacobian J = Kd + diag(phi') K and
    line-searches the step on the exact conditional objective over a fixed
    eta grid (eta = 0 included, so the sweep is monotone by construction —
    undamped GN oscillates whenever the kernel cannot resolve the source
    content and the optimum is large; measured max|u| bouncing 57..126 with
    the objective swinging 4 orders of magnitude).  A GN fixed point
    satisfies the exact stationarity grad_ut = 0: the normal equations ARE
    the stationarity conditions once J ut - r collapses the linearization.

Whitened coordinates are what make the envelope theorem *numerically* exact:
the iteration achieves stationarity in ut (measured residual ~1e-7 relative),
while mapping back to u = K ut and re-deriving through K^-1 amplifies the
solve floor by cond(K) (measured 19.5% envelope-gradient bias on the
Allen-Cahn log_v component when the loss consumed u instead of ut).  The
solvers therefore keep ut as the latent: the loss's prior quadratic is
ut' K ut, derivative lifts are Kd @ ut, and prediction is Kmn @ ut — no
training- or eval-time K^-1 solve exists anywhere in profiled mode.

The ``shift`` arguments serve the two-GP residual solver
(models/extra.py, reference: code/model_GP_solver_1d_extra.py:106-141):
phase 2 optimizes the same objective with boundary target b - u_base and
residual shifted by the frozen base lift, which maps onto these functions
with mb = m.(b - u_base), f = f - u_xx_base, u_shift = u_base.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gphm_tpu.ops.chol import robust_cholesky

# Line-search grid for the damped Gauss-Newton step: eta = 0 makes every
# iteration monotone; the geometric spacing covers the observed useful range
# (full steps near convergence, ~0.03 in the oscillatory large-optimum regime)
ETAS = (1.0, 0.5, 0.25, 0.12, 0.06, 0.03, 0.0)


def _spd_solve(K, wt_Kb, v, B, rhs, jitter, refine: bool):
    """Solve (K + wt K diag(m) K + v B'B) x = rhs at the operands' dtype.

    A relative ridge stabilizes the factorization: S's scale is
    data-dependent (v ||f||^2 can reach 1e10), so the absolute kernel jitter
    alone is meaningless here.  cond(S) ~ cond(K)^2, so the factorization
    must run at S's own (wide) precision — ``robust_cholesky`` routes f64
    through the blocked HLO tier on TPU (no custom calls; the f32-PCG
    refined path stalls at ~0.4 relative error at this conditioning,
    measured).

    ``refine`` adds one refinement sweep against the UNRIDGED S: the ridge's
    O(delta) bias on a Gauss-Newton fixed point's stationarity becomes
    O(delta^2) (measured: the Allen-Cahn fixed-point gradient drops from
    2e-3 * |grad at 0| to the f64 roundoff floor).  Gauss-Newton only — on
    the linear path's wildest-conditioned steps the unridged residual
    amplifies instead of refining (measured: a 400-epoch Poisson profiled
    run regresses 0.03 -> 1.6 rel-L2 with the sweep on).
    """
    S = K + wt_Kb + v * (B.T @ B)
    n = K.shape[-1]
    ridge = jnp.trace(S) / n
    Sr = S + (1e-10 * ridge) * jnp.eye(n, dtype=S.dtype)
    F = robust_cholesky(Sr, base_jitter=jitter, max_tries=0)
    x = F.solve(rhs)
    if not refine:
        return x
    return x + F.solve(rhs - S @ x)


def linear_ut_star(K, Kd, bc_mask, mb, f, wt, v, jitter):
    """Exact whitened conditional optimum for a linear residual Kd ut - f.

    ``bc_mask`` is the 0/1 boundary indicator over collocation points, ``mb``
    the masked boundary-target column (b embedded at boundary rows, zero
    elsewhere; for the two-GP phase 2, m.(b - u_base)).
    """
    Kb = (K * bc_mask[None, :]) @ K
    rhs = wt * (K @ mb) + v * (Kd.T @ f)
    return _spd_solve(K, wt * Kb, v, Kd, rhs, jitter, refine=False)


# Weak Gaussian prior precision on polynomial-trend coefficients: keeps the
# augmented system PD when the boundary/residual blocks do not span the
# basis, while contributing O(1e-8 ||beta||^2) to the objective — invisible
# at any attainable accuracy.  Fixed (not configurable) so the marginal
# objective's beta-prior normalizer is a constant across a run.
BETA_PRIOR_PREC = 1e-8


def _augmented_system(K, Kd, H, Hdd, bc_mask, wt, v):
    """Blocks of the joint (ut, beta) SPD system for a linear residual.

    With the polynomial trend u = K ut + H beta (ops/meanfn.py) the
    conditional objective stays an SPD quadratic in the stacked z =
    [ut; beta]:

        S_ext = [[K + wt K M K + v Kd'Kd,   wt K M H + v Kd'Hdd     ],
                 [      (sym)            ,  wt H'M H + v Hdd'Hdd + eI]]

    where M = diag(bc_mask).  Returns (S_ext, KMH) with KMH = K M H reused
    by callers for the rhs.
    """
    KM = K * bc_mask[None, :]
    KMH = KM @ H
    HM = H * bc_mask[:, None]
    A11 = K + wt * (KM @ K) + v * (Kd.T @ Kd)
    A12 = wt * KMH + v * (Kd.T @ Hdd)
    A22 = wt * (H.T @ HM) + v * (Hdd.T @ Hdd) \
        + BETA_PRIOR_PREC * jnp.eye(H.shape[1], dtype=K.dtype)
    return jnp.block([[A11, A12], [A12.T, A22]]), KMH


def _equilibrated_factor(S, jitter):
    """Cholesky of the symmetrically equilibrated D^-1/2 S D^-1/2
    (D = diag S), with a relative ridge that is now meaningful per-row.

    The augmented trend system's blocks differ in scale by ~1e9 (the
    ut-block carries v Kd'Kd ~ (2 pi freq_scale)^4 while the beta block is
    O(wt)); a trace-relative ridge lands on the small block's O(1)
    eigenvalues and biases the logdet by whole units (measured 4.5 on an
    18-point problem).  Equilibration makes the ridge relative to each
    row's own scale.  Returns (F, dsqrt) with S = D^1/2 Shat D^1/2.
    """
    n = S.shape[-1]
    eps = float(jnp.finfo(S.dtype).eps)
    dsq = jnp.sqrt(jnp.diagonal(S))
    Shat = S / dsq[:, None] / dsq[None, :]
    eye = jnp.eye(n, dtype=S.dtype)
    # Two-attempt branch-free ridge select. A single fixed ridge cannot
    # serve both regimes: small well-posed systems want ~eps (a 1e-11
    # ridge biases the logdet ~1e-3 against the beta prior's ~1e-8
    # eigenvalue), while hard configs (x2_add_sinx at freq_scale=100:
    # cond(S) ~ cond(K)^2 > 1/eps) are numerically indefinite after
    # equilibration (measured min eig -1.3e-14 at N=403) and need
    # >~ n*eps*lambda_max ~ 6e-12 for the factorization to succeed. A
    # gradient-free probe factorization at the small ridge picks the level;
    # jnp.where (not lax.cond) keeps the graph branch-free — the blocked
    # f64 Cholesky under a cond chain aborts this TPU backend's compiler.
    r_small, r_big = 4 * eps, max(1e-10, 1024 * n * eps)
    probe = robust_cholesky(jax.lax.stop_gradient(Shat) + r_small * eye,
                            base_jitter=jitter, max_tries=0).L
    r = jnp.where(jnp.all(jnp.isfinite(probe)), r_small, r_big)
    return robust_cholesky(Shat + r * eye, base_jitter=jitter,
                           max_tries=0), dsq


def trend_ridge_level(K, Kd, H, Hdd, bc_mask, wt, v, jitter):
    """Which ridge `_equilibrated_factor` selects for the CURRENT system:
    0.0 = small (4 eps), 1.0 = big (1024 n eps).

    Diagnostic only (off the training hot path): the two-attempt select is
    value-discontinuous across the regime boundary — the big ridge biases
    the logdet by whole units on near-singular directions — so a flip
    between consecutive checkpoints shows up as an otherwise-unexplained
    marginal-loss jump.  Logged at checkpoint cadence (experiment.py) so
    such jumps in the metrics stream can be attributed to the ridge, not
    the optimizer.
    """
    S, _ = _augmented_system(K, Kd, H, Hdd, bc_mask, wt, v)
    n = S.shape[-1]
    eps = float(jnp.finfo(S.dtype).eps)
    dsq = jnp.sqrt(jnp.diagonal(S))
    Shat = S / dsq[:, None] / dsq[None, :]
    eye = jnp.eye(n, dtype=S.dtype)
    probe = robust_cholesky(Shat + 4 * eps * eye,
                            base_jitter=jitter, max_tries=0).L
    return jnp.where(jnp.all(jnp.isfinite(probe)), 0.0, 1.0)


def linear_ut_beta_star(K, Kd, H, Hdd, bc_mask, mb, f, wt, v, jitter):
    """Joint whitened conditional optimum (ut*, beta*) with a polynomial
    trend u = K ut + H beta (universal kriging; see ops/meanfn.py).

    One Cholesky of the (N+p)-dim S_ext — p = degree+1 extra columns on top
    of ``linear_ut_star``'s system.  Returns ``(ut, beta)``.
    """
    n = K.shape[-1]
    S, _ = _augmented_system(K, Kd, H, Hdd, bc_mask, wt, v)
    rhs = jnp.concatenate(
        [wt * (K @ mb) + v * (Kd.T @ f),
         wt * (H.T @ mb) + v * (Hdd.T @ f)], axis=0)
    F, dsq = _equilibrated_factor(S, jitter)
    z = F.solve(rhs.reshape(-1) / dsq) / dsq
    return z[:n], z[n:]


def occam_logdet(K, B, bc_mask, wt, v, jitter, H=None, Hdd=None):
    """0.5 logdet S - logdet K: the Gaussian-integral (Occam) correction
    that turns the profiled conditional objective into the exact negative
    log MARGINAL likelihood for a linear residual (Laplace value for
    Gauss-Newton ``B``).

    With the latent integrated out analytically,
        -log p(data | theta) = Phi(ut*) + 0.5 logdet H_u + const,
        H_u = K^-1 + wt M + v A'A = K^-1 S K^-1   (A = B K^-1),
    so 0.5 logdet H_u = 0.5 logdet S - logdet K.  The joint-MAP objective
    (the reference's, code/model_GP_solver_1d.py:123-149) omits this term
    and is improper in the kernel hyperparameters once the latent is
    profiled: mixture weights/lengthscales can chase degenerate prior
    configurations with unboundedly good joint density (measured: w -> 4e3,
    ls -> 5e-3, MAP -> -inf while rel-L2 sticks at 1.6).  The marginal is a
    true density in the data, hence bounded and proper in every
    hyperparameter — including (tau, v), whose marginal variances saturate
    at the GP's own instead of collapsing.

    Differentiable (no envelope needed — this term does not depend on ut):
    one wide Cholesky of S, whose forward graph XLA shares (CSE) with the
    stop-gradient solve in the ``ut_star`` functions.

    With a polynomial trend (``H``/``Hdd`` given, flat-to-weak beta prior)
    the Laplace/Gaussian factor is over the stacked (ut, beta), so S is the
    augmented S_ext of ``linear_ut_beta_star`` — the same "0.5 logdet S -
    logdet K" identity holds because the whitening Jacobian (det K) touches
    only the ut block.
    """
    if H is not None:
        # augmented blocks differ in scale by ~1e9, so a trace-relative
        # ridge biases the beta block's logdet by whole units (measured
        # 4.5 at N=18) — factor the equilibrated system instead:
        # logdet S = logdet Shat + 2 sum(log dsqrt)
        S, _ = _augmented_system(K, B, H, Hdd, bc_mask, wt, v)
        FS, dsq = _equilibrated_factor(S, jitter)
        return 0.5 * FS.logdet() + jnp.sum(jnp.log(dsq))
    S = K + wt * ((K * bc_mask[None, :]) @ K) + v * (B.T @ B)
    n = S.shape[-1]
    ridge = jnp.trace(S) / n
    Sr = S + (1e-10 * ridge) * jnp.eye(n, dtype=S.dtype)
    FS = robust_cholesky(Sr, base_jitter=jitter, max_tries=0)
    return 0.5 * FS.logdet()


def gauss_newton_ut_star(K, Kd, bc_mask, mb, f, wt, v, jitter, ut0,
                         iters: int, phi, dphi, u_shift=None):
    """Damped Gauss-Newton whitened optimum for residual
    Kd ut + phi(u_shift + K ut) - f (Allen-Cahn: phi(w) = w^3 - w).

    Warm-start ``ut0`` with the previous step's optimum — the conditional
    optimum moves slowly with the hyperparameters, so a few line-searched
    iterations per step track it.  ``u_shift`` is a frozen additive latent
    (two-GP phase 2: the base GP's u); the boundary/residual shifts are
    folded into ``mb``/``f`` by the caller.
    """
    Kb = (K * bc_mask[None, :]) @ K
    rhs_b = wt * (K @ mb)
    mask = bc_mask.reshape(-1, 1)
    etas = jnp.asarray(ETAS, K.dtype)
    shift = 0.0 if u_shift is None else u_shift

    def data_terms(u, lin):
        r = lin + phi(shift + u) - f
        return (0.5 * wt * jnp.sum(mask * u ** 2 - 2.0 * u * mb)
                + 0.5 * v * jnp.sum(r ** 2))

    # lax.fori_loop, NOT a Python loop: unrolling lowered ``iters`` copies
    # of the factor-and-refine solve into one program (see the 2D twin in
    # models/solver_2d.py for the measured remote-compile consequence).
    # Every caller consumes the result under stop_gradient (envelope
    # gradient), so forward-only loop semantics suffice.
    def gn_body(_, carry):
        ut, u, lin = carry
        d = dphi(shift + u)
        B = Kd + d * K  # J: rows scaled by the pointwise derivative
        # affine GN target J ut_k - r(ut_k) = d.u - phi(shift+u) + f
        t = d * u - phi(shift + u) + f
        utn = _spd_solve(K, wt * Kb, v, B, rhs_b + v * (B.T @ t), jitter,
                         refine=True)
        dut = utn - ut
        du, dlin = K @ dut, Kd @ dut
        quad = jnp.sum(ut * u)

        def obj(eta):
            # 0.5 ut' K ut expands exactly in eta (K symmetric); the data
            # terms interpolate through the precomputed u/lin directions, so
            # the search is elementwise on top of two matmuls
            q = quad + 2.0 * eta * jnp.sum(dut * u) \
                + eta ** 2 * jnp.sum(dut * du)
            return 0.5 * q + data_terms(u + eta * du, lin + eta * dlin)

        eta = etas[jnp.argmin(jax.vmap(obj)(etas))]
        return ut + eta * dut, u + eta * du, lin + eta * dlin

    ut, _, _ = jax.lax.fori_loop(0, iters, gn_body, (ut0, K @ ut0, Kd @ ut0))
    return ut
