"""Profiled-latent normal solve for 2D linear PDEs on a Kronecker grid.

The 1D profiled-latent mode (models/solver_1d.py `_u_star`) replaces the
reference's 1e5-1e6-epoch Adam descent on the latent u with its closed-form
conditional optimum per hyperparameter step.  In 2D the same MAP objective
(reference: code/model_GP_solver_2d.py:151-169) is still quadratic in the
grid latent U for a linear residual (Poisson, advection), but the normal
matrix is an (N1*N2) x (N1*N2) operator that no longer factorizes over the
Kronecker axes — the ``||a1*U_dx + U_dy - f||^2`` data term couples every
per-axis eigenbasis.  A dense factorization (the 1D route) is impossible at
the production 400x400 grid, so this module solves the normal equations
matrix-free.

Derivation.  With per-axis Grams K1, K2 and derivative cross-Grams Kd1, Kd2
(d'th derivative in the first argument; symmetric for even d, antisymmetric
for odd), the U-gradient of the negative log-posterior is

    K1^-1 U K2^-1  +  wt * M.(U - B)  +  v * Radj(R(U) - F),
    R(U)    = a1 * Kd1 K1^-1 U + U (Kd2 K2^-1)^T          (the residual lift)
    Radj(W) = a1 * K1^-1 Kd1^T W + W Kd2 K2^-1            (its adjoint)

where M is the boundary mask grid (1 on edges, 2 on corners — the corner
entries appear twice in the reference's hstacked boundary vector,
code/model_GP_solver_2d.py:127), B the boundary-value grid, F the source
grid, wt = llk_weight * tau and v the residual precision.

Substituting U = K1 V K2 and multiplying the stationarity equation by K1 on
the left and K2 on the right clears every inverse (same move as the 1D
``S = K + wt K m K + v Kd Kd``): solve  S(V) = RHS  with

    S(V) = T + wt * K1 (M.T_grid) K2 + v * (a1 Kd1^T W K2 + K1 W Kd2),
    T    = K1 V K2,       W = a1 Kd1 V K2 + K1 V Kd2^T,
    RHS  = wt * K1 (M.B) K2 + v * (a1 Kd1^T F K2 + K1 F Kd2),

then U* = K1 V K2.  S is SPD (it is G + wt G D G + v G L'L G with
G = K2 (x) K1 in vec form) and built from MXU matmuls only.

Solver: warm-started preconditioned CG.  cond(S) ~ cond(G)^2 (~1e14 at the
production conditioning) makes plain CG hopeless; the preconditioner
diagonalizes S's *separable approximation* in the per-axis eigenbasis.  With
K1 = Q1 L1 Q1', approximating Kd1 as codiagonal with K1 (exact only for
commuting Toeplitz pairs — the uniform-grid stationary-kernel case is close),
every term of S has the basis (Q2 (x) Q1) and the explicit diagonal

    P_kl = l1_k l2_l                                        (prior term)
         + wt * l1_k^2 l2_l^2 (rho1_k + rho2_l)             (boundary term)
         + v * (a1^2 s1_k l2_l^2 + 2 a1 l1_k l2_l d1_k d2_l + l1_k^2 s2_l)

with l = diag(Q'KQ), d = diag(Q'Kd Q), s = diag(Q'Kd'Kd Q) (exact f64
Rayleigh diagonals, so P_kl >= (a1 d1 l2 + l1 d2)^2 + ... > 0 by
Cauchy-Schwarz regardless of basis error), and rho_k = Q[0,k]^2 + Q[-1,k]^2
the boundary leverage (sum_ij m_ij Q1[i,k]^2 Q2[j,l]^2 = rho1_k + rho2_l
exactly, because the edge mask is the rank-2 sum r_i + c_j).  The basis
itself comes from a float32 ``eigh`` — the TPU-native path; basis error only
costs CG iterations, never correctness, because P is applied as an exactly
SPD operator Q (y / P) Q' in f64.

Everything here runs under ``stop_gradient`` (the envelope theorem makes the
hyperparameter gradient at u* the plain loss gradient), so no custom VJPs
are needed.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class AxisSpec(NamedTuple):
    """Per-axis eigenbasis + f64 Rayleigh diagnostics for the preconditioner."""

    Q: jax.Array      # (N, N) approximate eigenbasis of K (wide dtype)
    lam: jax.Array    # diag(Q' K Q)   > 0
    d: jax.Array      # diag(Q' Kd Q)
    s: jax.Array      # diag(Q' Kd' Kd Q) >= d^2
    rho: jax.Array    # Q[0]^2 + Q[-1]^2 (boundary leverage)


def axis_spec(K, Kd) -> AxisSpec:
    """Eigenbasis via f32 ``eigh`` (TPU-native QDWH; the basis need not be
    exact) with exact wide-dtype Rayleigh diagonals.  The basis is frozen
    with ``stop_gradient`` — the CG path runs under an outer stop_gradient
    anyway, and the marginal-objective surrogate (``occam_logdet_2d``)
    differentiates only the Rayleigh diagonals, which are plain matmuls of
    K/Kd against the frozen basis (eigh JVPs are unstable under eigenvalue
    crossings and never needed here)."""
    Q = jax.lax.stop_gradient(
        jnp.linalg.eigh(K.astype(jnp.float32))[1].astype(K.dtype))
    KQ = K @ Q
    KdQ = Kd @ Q
    return AxisSpec(
        Q=Q,
        lam=jnp.sum(Q * KQ, axis=0),
        d=jnp.sum(Q * KdQ, axis=0),
        s=jnp.sum(KdQ * KdQ, axis=0),
        rho=Q[0] ** 2 + Q[-1] ** 2,
    )


def precond_diag(a1: jax.Array, wt, v, s1: AxisSpec, s2: AxisSpec,
                 dbar=0.0):
    """The (N1, N2) eigenbasis diagonal of S's separable approximation.

    ``dbar`` is the mean of a Gauss-Newton diagonal weight (Allen-Cahn:
    mean(3u^2 - 1)); the Jacobian diagonal becomes
    (a1 d1 l2 + l1 d2 + dbar l1 l2) with the same Cauchy-Schwarz spread
    terms (s - d^2), so P stays strictly positive for any basis."""
    l1, l2 = s1.lam[:, None], s2.lam[None, :]
    bnd = l1 ** 2 * l2 ** 2 * (s1.rho[:, None] + s2.rho[None, :])
    jd = (a1 * (s1.d[:, None] * l2) + l1 * s2.d[None, :]
          + dbar * l1 * l2)
    res = (jd ** 2
           + a1 ** 2 * (s1.s - s1.d ** 2)[:, None] * l2 ** 2
           + l1 ** 2 * (s2.s - s2.d ** 2)[None, :])
    P = l1 * l2 + wt * bnd + v * res
    return jnp.maximum(P, jnp.finfo(P.dtype).tiny)


def occam_logdet_2d(K1, Kd1, K2, Kd2, a1, wt, v, dbar=0.0):
    """Separable-eigenbasis surrogate of 0.5 logdet S for the 2D marginal
    objective (see ops/profile1d.occam_logdet for the exact 1D analog and
    the properness rationale).

    S has no tractable exact log-determinant at the production grid (it is
    the (N1 N2)^2 normal operator the profiled CG inverts matrix-free), but
    its separable approximation is diagonal in the frozen per-axis
    eigenbasis with the strictly positive diagonal ``precond_diag`` — the
    same approximation that preconditions the CG.  Sum-of-logs of that
    diagonal is exact when Kd commutes with K (uniform-grid stationary
    kernels are close) and is differentiable through the Rayleigh diagonals
    (the basis itself is frozen, see ``axis_spec``).  As wt or v -> inf the
    surrogate grows with the correct leading-order rank terms, which is
    what bounds the hyperparameter ascent.
    """
    s1 = axis_spec(K1, Kd1)
    s2 = axis_spec(K2, Kd2)
    Pd = precond_diag(a1, wt, v, s1, s2, dbar=dbar)
    return 0.5 * jnp.sum(jnp.log(Pd))


def s_matrix_2d(K1, Kd1, K2, Kd2, mask, wt, v, a1, dgrid=None):
    """Exact dense normal operator S in whitened V coordinates — the
    (N1 N2, N1 N2) matrix the profiled CG applies matrix-free
    (``profiled_u_star_2d``'s ``sop``), assembled for small grids only
    (surrogate validation, exact small-N Occam term).

    Row-major vec (numpy ``reshape(-1)`` of the (N1, N2) grid):

        S = G + wt * G D_m G + v * W' W,
        G = K1 (x) K2,     D_m = diag(vec mask),
        W = a1 * Kd1 (x) K2 + K1 (x) Kd2  [+ diag(vec dgrid) G],

    where the Kronecker identities use K1/K2 symmetric (Kd1/Kd2 need not
    be — advection's first-derivative cross-Grams are antisymmetric).
    ``dgrid`` is the Gauss-Newton diagonal weight (Allen-Cahn: 3 U^2 - 1).
    Agreement with the matvec is pinned by tests/test_occam2d.py.
    """
    G = jnp.kron(K1, K2)
    W = a1 * jnp.kron(Kd1, K2) + jnp.kron(K1, Kd2)
    if dgrid is not None:
        W = W + dgrid.reshape(-1, 1) * G
    S = G + wt * (G @ (mask.reshape(-1, 1) * G)) + v * (W.T @ W)
    return 0.5 * (S + S.T)


def occam_logdet_2d_exact(K1, Kd1, K2, Kd2, mask, a1, wt, v, dgrid=None,
                          H1=None, H1D=None, H2=None, H2D=None, eps=None):
    """Exact 0.5 logdet S — the quantity ``occam_logdet_2d`` surrogates.

    Dense assembly + Cholesky: O((N1 N2)^3), so small grids only (the
    production 400^2 keeps the separable surrogate; this is the ground
    truth it is validated against, and an exact small-N objective option
    via Solver2D config ``occam_2d: 'exact'``).  Same trace-relative ridge
    as the 1D exact path (ops/profile1d.occam_logdet).

    With the trend bases given, returns 0.5 logdet of the AUGMENTED
    (V, beta) system — S plus ``trend_block`` plus the exact coupling
    C = wt G D_m Hk + v W' Wb (Hk = H1 (x) H2, Wb the trend's residual
    lift) that both the separable surrogate and the solver's additive
    0.5 logdet Qb term drop.

    Factored via the symmetric equilibration of ops/profile1d
    (logdet S = logdet Shat + 2 sum log dsqrt): the blocks span ~9+ orders
    of scale, so a trace-relative ridge would bias the small directions'
    logdet by whole units (the measured 1D failure mode).
    """
    from gphm_tpu.ops.profile1d import _equilibrated_factor
    S = s_matrix_2d(K1, Kd1, K2, Kd2, mask, wt, v, a1, dgrid=dgrid)
    if H1 is not None:
        r1 = jnp.zeros(K1.shape[0], K1.dtype).at[0].set(1.0).at[-1].set(1.0)
        r2 = jnp.zeros(K2.shape[0], K2.dtype).at[0].set(1.0).at[-1].set(1.0)
        Qb = trend_block(H1, H1D, H2, H2D, r1, r2, wt, v, a1, eps)
        G = jnp.kron(K1, K2)
        Hk = jnp.kron(H1, H2)
        W = a1 * jnp.kron(Kd1, K2) + jnp.kron(K1, Kd2)
        if dgrid is not None:
            W = W + dgrid.reshape(-1, 1) * G
        Wb = a1 * jnp.kron(H1D, H2) + jnp.kron(H1, H2D)
        C = wt * (G @ (mask.reshape(-1, 1) * Hk)) + v * (W.T @ Wb)
        S = jnp.block([[S, C], [C.T, Qb]])
    F, dsq = _equilibrated_factor(S, 0.0)
    return 0.5 * F.logdet() + jnp.sum(jnp.log(dsq))


def occam_logdet_2d_slq(K1, Kd1, K2, Kd2, a1, wt, v, dbar=0.0, *,
                        probes: int = 8, lanczos_iters: int = 24,
                        cg_iters: int = 60, seed: int = 0,
                        cv: bool = True):
    """Production-tier corrected Occam term: 0.5 logdet S with the
    separable surrogate's bias removed stochastically (round-3 VERDICT #2;
    the surrogate alone is measured badly biased at trained sharp
    hyperparameters — tools/probe_occam2d.py: value off by ~7.7e3 nats,
    freq-gradient cosine ~0 at N=48 sin_sin ep600).

    Split  logdet S = sum log Pd + logdet(P^-1/2 S P^-1/2):  P is the
    separable eigenbasis diagonal (``precond_diag`` — the SAME operator
    that preconditions the profiled CG), so the stochastic part only
    estimates the *remainder* the surrogate misses, on an operator whose
    spectrum is clustered near 1 wherever the surrogate is good — few
    Lanczos iterations suffice exactly when the correction is small.

    VALUE: stochastic Lanczos quadrature (ops/slq.py machinery inlined on
    the grid matvec) with fixed Rademacher probes (deterministic across
    steps — a fixed probe set's bias is constant and does not steer Adam).

    GRADIENT (``cv=True``, the round-5 stabilized default): exact
    separable gradient + control-variated Hutchinson remainder,

        d logdet S = d sum log Pd                       (exact, autodiff
                                                         through the
                                                         Rayleigh diags)
                   + (1/m) sum_m [(S^-1 z)' dS z - (P^-1 z)' dP z],

    with both solves under stop_gradient (S^-1 z from the eigenbasis-
    preconditioned CG, P^-1 z exactly in the eigenbasis). The bracket
    estimates d[logdet S - sum log Pd]; wherever P ~ S — most of the
    spectrum, by construction — the two Hutchinson terms cancel
    probe-by-probe, so the estimator's variance scales with the size of
    the remainder instead of with |d logdet S| itself. The round-4
    in-loop divergence (campaign Y2: the plain-Hutchinson gradient
    replaced the ENTIRE separable gradient with a noisy estimate whose
    noise concentrated exactly on the sharp-mixture freq directions;
    excursion to 6.9e4 at ep250) is the measured failure this removes.
    ``cv=False`` keeps the round-4 estimator for A/B measurement.

    Never differentiates through the Lanczos recurrence. Assembled with
    the standard value + (g - stop_grad(g)) carrier, so no custom VJP.
    """
    from gphm_tpu.ops.slq import _quadrature_logdet, rademacher_probes

    s1 = axis_spec(K1, Kd1)
    s2 = axis_spec(K2, Kd2)
    Pd = precond_diag(a1, wt, v, s1, s2, dbar=dbar)
    N1, N2 = Pd.shape
    n = N1 * N2
    Kd2t = Kd2.T

    # the matvec of profiled_u_star_2d with the rank-2 edge mask (1 on
    # edges, 2 on corners = r_i + c_j) applied explicitly; the scalar GN
    # weight dbar enters both the lift and its adjoint (mean-field
    # Allen-Cahn — consistent with the diagonal this module preconditions)
    def sop(V):
        P1 = K1 @ V
        T = P1 @ K2
        W = a1 * ((Kd1 @ V) @ K2) + P1 @ Kd2t + dbar * T
        bnd = jnp.zeros_like(T)
        bnd = bnd.at[0, :].add(T[0, :]).at[-1, :].add(T[-1, :])
        bnd = bnd.at[:, 0].add(T[:, 0]).at[:, -1].add(T[:, -1])
        adj = a1 * (Kd1.T @ W @ K2) + K1 @ (W @ Kd2) \
            + dbar * (K1 @ W @ K2)
        return T + wt * (K1 @ bnd @ K2) + v * adj

    sqP = jnp.sqrt(Pd)

    def to_eig(X):
        return s1.Q.T @ X @ s2.Q

    def from_eig(X):
        return s1.Q @ X @ s2.Q.T

    def m_op(x):
        # P^-1/2 S P^-1/2 on flat vectors (symmetric preconditioning)
        X = from_eig(to_eig(x.reshape(N1, N2)) / sqP)
        Y = sop(X)
        return from_eig(to_eig(Y) / sqP).reshape(-1)

    Z = jax.lax.stop_gradient(rademacher_probes(n, probes, K1.dtype,
                                                seed=seed))
    corr = _quadrature_logdet(m_op, Z, lanczos_iters)

    def minv(R):
        return from_eig(to_eig(R) / Pd)

    Zg = jax.lax.stop_gradient(Z.T.reshape(probes, N1, N2))
    Ys = jax.vmap(lambda z: pcg_grid(
        lambda V: jax.lax.stop_gradient(sop(V)), minv, z,
        jnp.zeros_like(z), cg_iters)[0])(Zg)
    Ys = jax.lax.stop_gradient(Ys)

    if not cv:
        # round-4 estimator (measured divergent in-loop, kept for A/B):
        # value's separable part frozen, gradient entirely Hutchinson
        value = jax.lax.stop_gradient(0.5 * corr) \
            + 0.5 * jnp.sum(jnp.log(jax.lax.stop_gradient(Pd)))
        carrier = 0.5 * jnp.mean(
            jax.vmap(lambda y, z: jnp.vdot(y, sop(z)))(Ys, Zg))
        return value + carrier - jax.lax.stop_gradient(carrier)

    # CV estimator: exact separable gradient (Pd differentiable) +
    # control-variated Hutchinson remainder
    value = jax.lax.stop_gradient(0.5 * corr) + 0.5 * jnp.sum(jnp.log(Pd))

    def pop(X):
        # the separable approximation P as a differentiable operator:
        # Q (Pd . Q' X Q) Q' with the basis frozen (axis_spec)
        return from_eig(Pd * to_eig(X))

    YsP = jax.lax.stop_gradient(jax.vmap(minv)(Zg))
    carrier = 0.5 * jnp.mean(
        jax.vmap(lambda ys, yp, z: jnp.vdot(ys, sop(z))
                 - jnp.vdot(yp, pop(z)))(Ys, YsP, Zg))
    return value + carrier - jax.lax.stop_gradient(carrier)


def pcg_grid(matvec: Callable, minv: Callable, B, X0, iters: int):
    """Fixed-iteration preconditioned CG on grid-shaped unknowns.

    Same guarded-update scheme as ops/refined._pcg (alpha/beta forced to 0
    on a vanished search direction, so over-provisioned iteration counts are
    harmless no-ops).  Returns (X, final preconditioned residual norm^2)."""
    X = X0
    R = B - matvec(X0)
    Z = minv(R)
    P = Z
    rz = jnp.vdot(R, Z)
    tiny = jnp.asarray(jnp.finfo(B.dtype).tiny, B.dtype)

    def safe_div(a, b):
        ok = jnp.abs(b) > tiny
        return jnp.where(ok, a / jnp.where(ok, b, 1.0), jnp.zeros_like(a))

    def body(_, carry):
        X, R, P, rz = carry
        Ap = matvec(P)
        alpha = safe_div(rz, jnp.vdot(P, Ap))
        X = X + alpha * P
        R = R - alpha * Ap
        Z = minv(R)
        rz_new = jnp.vdot(R, Z)
        beta = safe_div(rz_new, rz)
        P = Z + beta * P
        return X, R, P, rz_new

    X, _, _, rz = jax.lax.fori_loop(0, iters, body, (X, R, P, rz))
    return X, rz


def trend_block(H1, H1D, H2, H2D, r1, r2, wt, v, a1, eps):
    """Exact dense beta-block of the trend-augmented normal operator.

    With the separable trend T(beta) = H1 beta H2' (row-major
    vec: (H1 (x) H2) vec_r(beta)) and residual lift
    Lt(beta) = a1 H1D beta H2' + H1 beta H2D', the beta-beta block of the
    joint quadratic's Hessian is the (p1 p2, p1 p2) matrix

        Q_b = eps I
            + wt [ (H1' R H1) (x) (H2' H2) + (H1' H1) (x) (H2' C H2) ]
            + v  [ a1^2 (H1D'H1D) (x) (H2'H2) + a1 (H1D'H1) (x) (H2'H2D)
                 + a1 (H1'H1D) (x) (H2D'H2) + (H1'H1) (x) (H2D'H2D) ],

    exact because the boundary mask is the rank-2 sum m_ij = r_i + c_j
    (R = diag(r1), C = diag(r2); corners correctly weighted 2). Every
    factor is a (p, p) Gram of the small bases — no N^2 objects. Used both
    as the beta-block preconditioner of the joint PCG and as the beta-
    directions term of the marginal Occam surrogate."""
    G1, G2 = H1.T @ H1, H2.T @ H2
    bnd = jnp.kron(H1.T @ (r1[:, None] * H1), G2) \
        + jnp.kron(G1, H2.T @ (r2[:, None] * H2))
    res = (a1 ** 2 * jnp.kron(H1D.T @ H1D, G2)
           + a1 * jnp.kron(H1D.T @ H1, H2.T @ H2D)
           + a1 * jnp.kron(H1.T @ H1D, H2D.T @ H2)
           + jnp.kron(G1, H2D.T @ H2D))
    p = G1.shape[0] * G2.shape[0]
    Qb = wt * bnd + v * res + eps * jnp.eye(p, dtype=H1.dtype)
    return 0.5 * (Qb + Qb.T)


def pcg_pair(matvec: Callable, minv: Callable, B, X0, iters: int):
    """``pcg_grid`` on a (grid, small-block) pair of unknowns — the joint
    inner product is the sum of the per-part ones."""
    def vdot2(a, b):
        return jnp.vdot(a[0], b[0]) + jnp.vdot(a[1], b[1])

    def axpy(a, x, y):
        return (y[0] + a * x[0], y[1] + a * x[1])

    X = X0
    AX = matvec(X0)
    R = (B[0] - AX[0], B[1] - AX[1])
    Z = minv(R)
    P = Z
    rz = vdot2(R, Z)
    tiny = jnp.asarray(jnp.finfo(B[0].dtype).tiny, B[0].dtype)

    def safe_div(a, b):
        ok = jnp.abs(b) > tiny
        return jnp.where(ok, a / jnp.where(ok, b, 1.0), jnp.zeros_like(a))

    def body(_, carry):
        X, R, P, rz = carry
        Ap = matvec(P)
        alpha = safe_div(rz, vdot2(P, Ap))
        X = axpy(alpha, P, X)
        R = axpy(-alpha, Ap, R)
        Z = minv(R)
        rz_new = vdot2(R, Z)
        beta = safe_div(rz_new, rz)
        P = axpy(beta, P, Z)
        return X, R, P, rz_new

    X, _, _, rz = jax.lax.fori_loop(0, iters, body, (X, R, P, rz))
    return X, rz


def profiled_u_beta_star_2d(K1, Kd1, K2, Kd2, H1, H1D, H2, H2D,
                            mask, bgrid, src, wt, v, a1, V0, beta0,
                            iters: int, eps):
    """Joint conditional optimum (V*, beta*) of the trend-augmented 2D MAP
    objective — the 2D analog of ops/profile1d.linear_ut_beta_star.

    Total latent U = K1 V K2 + H1 beta H2' (universal kriging,
    ops/meanfn.py); the objective stays jointly quadratic in (V, beta) for
    a linear residual, so one joint PCG on the SPD augmented operator

        [ S      C  ] [vec V ]   [ rhs_V ]
        [ C'   Q_b  ] [vec b ] = [ rhs_b ]

    replaces the Adam descent on both. Block-diagonal preconditioner: the
    separable eigenbasis diagonal for the V block (``precond_diag``) and
    the exact dense inverse of ``trend_block`` for the (tiny) beta block.
    ``H1D/H2D`` must carry the PDE's derivative order (Hdd for Poisson,
    Hd for advection). Returns (U*, V*, beta*); wrap in ``stop_gradient``
    (envelope theorem).

    The (V, beta) SPLIT needs a tie-break: whenever the trend lies inside
    the GP's span (a mixture with near-zero frequencies — always true at
    init), the split direction's curvature is just the loss's 1e-8 beta
    ridge, ~18 orders below the Hessian's top eigenvalue and therefore
    below f64 resolution for any solver. Left alone, the solve returns
    beta ~ O(1e3) with a huge compensating GP part whose cancellation is
    exact on the collocation grid but NOT on the test grid (measured:
    rel-L2 ~3e2 predictions). The solve therefore carries a RELATIVE beta
    ridge (1e-8 x the beta-block's mean diagonal — the same equilibrated-
    ridge idea as the 1D dense factorization): while the split is
    degenerate it selects the minimal-``beta`` representative, and once
    training sharpens the mixture onto the solution's spectral lines the
    real curvature (the kernel no longer supports the smooth trend — the
    noise-floor mechanism the trend exists to fix) dominates the ridge and
    beta converges to the true trend. The stationarity bias is O(ridge),
    far inside CG's own tolerance."""
    Kd2t = Kd2.T

    def jadj(W):
        return a1 * (Kd1.T @ W @ K2) + K1 @ (W @ Kd2)

    def lt(b):
        return a1 * (H1D @ b @ H2.T) + H1 @ b @ H2D.T

    def lt_adj(W):
        return a1 * (H1D.T @ W @ H2) + H1.T @ W @ H2D

    r1 = mask[:, 0] * 0.0
    r1 = r1.at[0].set(1.0).at[-1].set(1.0)
    r2 = mask[0, :] * 0.0
    r2 = r2.at[0].set(1.0).at[-1].set(1.0)
    Qb = trend_block(H1, H1D, H2, H2D, r1, r2, wt, v, a1, eps)
    p1, p2 = H1.shape[1], H2.shape[1]
    # relative beta ridge: the split tie-break (see docstring)
    ridge = 1e-8 * jnp.mean(jnp.diag(Qb))
    Qb = Qb + ridge * jnp.eye(p1 * p2, dtype=Qb.dtype)

    def matvec(x):
        V, b = x
        P1 = K1 @ V
        Tg = P1 @ K2
        W = a1 * ((Kd1 @ V) @ K2) + P1 @ Kd2t + lt(b)
        Mtot = mask * (Tg + H1 @ b @ H2.T)
        outV = Tg + wt * (K1 @ Mtot @ K2) + v * jadj(W)
        outB = (eps + ridge) * b + wt * (H1.T @ Mtot @ H2) + v * lt_adj(W)
        return outV, outB

    mb = mask * bgrid
    rhs = (wt * (K1 @ mb @ K2) + v * jadj(src),
           wt * (H1.T @ mb @ H2) + v * lt_adj(src))

    s1 = axis_spec(K1, Kd1)
    s2 = axis_spec(K2, Kd2)
    Pd = precond_diag(a1, wt, v, s1, s2)
    # factor the SPD beta block once via the repo's TPU-f64-safe Cholesky
    # (stock jnp.linalg.solve lowers to LuDecomposition, which XLA:TPU
    # implements for f32 only — measured compile failure at f64[9,9])
    from gphm_tpu.ops.chol import robust_cholesky
    Fb = robust_cholesky(Qb, max_tries=0)

    def minv(R):
        Rv, Rb = R
        Zb = Fb.solve(Rb.reshape(-1, 1)).reshape(p1, p2)
        return s1.Q @ ((s1.Q.T @ Rv @ s2.Q) / Pd) @ s2.Q.T, Zb

    (V, beta), _ = pcg_pair(matvec, minv, rhs, (V0, beta0), iters)
    return K1 @ V @ K2 + H1 @ beta @ H2.T, V, beta


def profiled_u_star_2d(K1, Kd1, K2, Kd2, mask, bgrid, src, wt, v,
                       a1, V0, iters: int, dgrid=None):
    """Conditional optimum U*(theta) of the 2D MAP objective for a
    residual with lift  J(U) = a1*U_dx + U_dy [+ D.U]  and target ``src``.

    ``dgrid`` is a Gauss-Newton diagonal weight grid (Allen-Cahn:
    D = 3 U_k^2 - 1, with ``src`` the affine target f + 2 U_k^3); None for
    linear residuals.  All operands at the wide (f64) tier; ``V0``
    warm-starts the CG from the previous optimum in V-coordinates
    (V = K1^-1 U K2^-1).  Returns (U*, V*) — V* is the warm start for the
    next step/GN iteration.  Wrap the result in ``stop_gradient``
    (envelope theorem).
    """
    Kd2t = Kd2.T

    def jadj(W):
        out = a1 * (Kd1.T @ W @ K2) + K1 @ (W @ Kd2)
        if dgrid is not None:
            out = out + K1 @ (dgrid * W) @ K2
        return out

    def sop(V):
        P1 = K1 @ V
        T = P1 @ K2
        W = a1 * ((Kd1 @ V) @ K2) + P1 @ Kd2t
        if dgrid is not None:
            W = W + dgrid * T
        out = T + wt * (K1 @ (mask * T) @ K2)
        return out + v * jadj(W)

    rhs = wt * (K1 @ (mask * bgrid) @ K2) + v * jadj(src)

    s1 = axis_spec(K1, Kd1)
    s2 = axis_spec(K2, Kd2)
    dbar = jnp.mean(dgrid) if dgrid is not None else 0.0
    Pd = precond_diag(a1, wt, v, s1, s2, dbar=dbar)

    def minv(R):
        return s1.Q @ ((s1.Q.T @ R @ s2.Q) / Pd) @ s2.Q.T

    V, _ = pcg_grid(sop, minv, rhs, V0, iters)
    return K1 @ V @ K2, V
