"""2D GP-HM solver on a grid with Kronecker-product kernel structure.

Covers the reference's three 2D solver families with one implementation:
  * Poisson      u_xx + u_yy = f          (code/model_GP_solver_2d.py:31-352)
  * Allen-Cahn   u_xx + u_yy + u(u^2-1) = f
  * advection    beta u_x + u_y = f       (code/model_GP_solver_advection.py:30-351,
                 differing only in using first-derivative cross-covariances)

The covariance over the N1 x N2 grid is K1 (x) K2; only per-dimension N x N
matrices are ever formed. Derivative lifts are Kronecker-structured matmuls:

    U_xx = K1_dxx K1^-1 U,   U_yy = (K2_dyy K2^-1 U')'
    (reference: code/model_GP_solver_2d.py:104-119)

and the prior uses the Kronecker identities
    logdet = N2 log|K1| + N1 log|K2|
    quad   = sum(K1invU * (K2invUt)')
    (reference: code/model_GP_solver_2d.py:157-162)

TPU redesign: per-dimension Cholesky factors are shared by the solves, the
quadratic form, and the log-determinants (the reference runs two LU solves
plus two slogdet LUs per step); all lifts are MXU matmuls on the natural grid
layout, which is the layout sharded across the device mesh in multi-chip runs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


from gphm_tpu.models.base import TrainResult, TrainState, chunked_train, \
    make_chunk_runner
from gphm_tpu.ops.chol import policy_cholesky
from gphm_tpu.ops.profile1d import ETAS
from gphm_tpu.ops.kernels import StationaryKernel, get_kernel, \
    init_mixture_params
from gphm_tpu.precision import Policy, default_policy
from gphm_tpu.problems.equations import Problem2D


class Solver2D:
    def __init__(self, problem: Problem2D, kernel, config: dict,
                 policy: Optional[Policy] = None):
        self.problem = problem
        self.kernel: StationaryKernel = (
            get_kernel(kernel) if isinstance(kernel, str) else kernel)
        self.config = dict(config)
        self.policy = (policy or default_policy()).activate()
        p = self.policy

        # refined tier: wide hot-loop Grams/residuals + f32 factorization
        # with f64-residual refinement (see Solver1D.__init__ / ops/refined.py)
        self.wide_train = bool(p.refine_iters) and jax.config.jax_enable_x64

        self.x_col = jnp.asarray(problem.x_col, p.dtype)
        self.y_col = jnp.asarray(problem.y_col, p.dtype)
        self.src = jnp.asarray(problem.src, p.dtype)
        src64 = getattr(problem, "src64", None)
        self.src_loss = (jnp.asarray(src64, jnp.float64)
                         if self.wide_train and src64 is not None
                         else self.src)
        self.bc_vals = jnp.asarray(problem.bc_vals, p.dtype)
        self.x_test = jnp.asarray(problem.x_test, p.dtype)
        self.y_test = jnp.asarray(problem.y_test, p.dtype)
        self.u_test = jnp.asarray(problem.u_test, p.dtype)
        self.N1 = int(self.x_col.shape[0])
        self.N2 = int(self.y_col.shape[0])
        self.Nc = self.N1 * self.N2
        self.Nb = int(self.bc_vals.shape[0])
        self.beta = float(problem.beta)

        # Per-dimension Gram builders: Toeplitz lags on uniform grids,
        # two-float lags for exact-phase f32 training, f64 lags for honest
        # evals (see ops/gram.AxisGram and Solver1D)
        from gphm_tpu.ops.gram import AxisGram, CrossGram, resolve_phase_exact
        use_toe = config.get("toeplitz", "auto")
        phase_exact = resolve_phase_exact(config.get("phase_exact", "auto"))
        self.axis1 = AxisGram(
            self.x_col, p.dtype, x64=getattr(problem, "x_col64", None),
            toeplitz=use_toe, phase_exact=phase_exact)
        self.axis2 = AxisGram(
            self.y_col, p.dtype, x64=getattr(problem, "y_col64", None),
            toeplitz=use_toe, phase_exact=phase_exact)
        self.cross1 = CrossGram(
            self.x_test, self.x_col, p.dtype,
            x1_64=getattr(problem, "x_test64", None),
            x2_64=getattr(problem, "x_col64", None), phase_exact=phase_exact)
        self.cross2 = CrossGram(
            self.y_test, self.y_col, p.dtype,
            x1_64=getattr(problem, "y_test64", None),
            x2_64=getattr(problem, "y_col64", None), phase_exact=phase_exact)
        self.toeplitz = self.axis1.toeplitz and self.axis2.toeplitz

        self.jitter = float(config.get("jitter", 1e-6))
        self.llk_weight = float(config["llk_weight"])
        self.logdet_flag = float(bool(config.get("logdet", True)))
        self.eq_type = problem.eq_type
        # advection uses first-derivative cross-covariances, Poisson/AC second
        self.deriv_order = 1 if self.eq_type == "advection" else 2

        # Separable polynomial mean function (round-3 VERDICT #8): the 2D
        # analog of the 1D universal-kriging trend (ops/meanfn.py) is the
        # tensor-product basis U = H1 B H2' + GP with B a (p, p) coefficient
        # grid — it rides the same Kronecker lifts (every trend operation is
        # an (N, p) x (p, p) x (p, N) matmul chain) and targets the same
        # smooth-mode-below-the-noise-floor mechanism that bound x2_add_sinx
        # (allencahn_2d / sin_add_cos carry low-frequency components under
        # their high-frequency lines). Adam mode trains B alongside the
        # latent; profiled mode solves (V, B) jointly in closed form each
        # step (ops/kron_profile.profiled_u_beta_star_2d) — the route that
        # actually moves the needle: Adam's latent develops a boundary-only
        # smooth mode at ~1e-5 rel-L2 per 1k epochs (measured on
        # x2y2_add_sinsin: the high-frequency prior does not propagate edge
        # information inward), while the joint conditional solve transfers
        # it instantly. The GP prior centers on the trend: quad/prior terms
        # apply to U - H1 B H2'.
        self.mean_poly = int(config.get("mean_poly", -1))
        self.n_beta = self.mean_poly + 1 if self.mean_poly >= 0 else 0
        if self.n_beta:
            if str(config.get("u_mode", "adam")) == "profiled" \
                    and problem.eq_type == "allencahn_2d":
                raise ValueError(
                    "mean_poly with the profiled 2D engine supports linear "
                    "residuals only (poisson_2d / advection); Allen-Cahn's "
                    "Gauss-Newton path does not carry the trend yet — use "
                    "u_mode='adam'")
            from gphm_tpu.ops.meanfn import poly_basis
            xs, dom, bases = [], [], []
            for axis_x, axis_t in (("x_col64", "x_test64"),
                                   ("y_col64", "y_test64")):
                xc = getattr(problem, axis_x, None)
                xc = np.asarray(getattr(problem, axis_x.replace("64", ""))
                                if xc is None else xc, np.float64)
                xt = getattr(problem, axis_t, None)
                xt = np.asarray(getattr(problem, axis_t.replace("64", ""))
                                if xt is None else xt, np.float64)
                d = (float(xc.min()), float(xc.max()))
                H, Hd, Hdd = poly_basis(xc, self.mean_poly, d)
                Ht, _, _ = poly_basis(xt, self.mean_poly, d)
                bases.append((jnp.asarray(H), jnp.asarray(Hd),
                              jnp.asarray(Hdd), jnp.asarray(Ht)))
            (self._H1, self._H1d, self._H1dd, self._H1t), \
                (self._H2, self._H2d, self._H2dd, self._H2t) = bases

        # Profiled-latent mode (u_mode "profiled"): the 2D MAP objective is
        # quadratic in the grid latent U for a linear residual, so each step
        # overwrites U with its conditional optimum U*(theta) instead of
        # descending on 160k latent values with Adam (see Solver1D.__init__
        # and ops/kron_profile.py for the derivation).  Unlike 1D there is
        # no dense normal factorization at N=400^2: U* comes from
        # warm-started eigenbasis-preconditioned CG on the matmul-only
        # normal operator S(V), U = K1 V K2.
        self.u_mode = str(config.get("u_mode", "adam"))
        # Profiled mode stores the WHITENED latent V = K1^-1 U K2^-1 in the
        # params' "U" leaf (see Solver1D and ops/profile1d.py: the envelope
        # gradient is exact in the coordinates where the conditional solve
        # achieves stationarity, and all lifts/predictions become solve-free)
        self.whitened = self.u_mode == "profiled"
        freeze = config.get("freeze")
        if self.u_mode == "profiled":
            if self.eq_type not in ("poisson_2d", "advection",
                                    "allencahn_2d"):
                raise ValueError(
                    f"u_mode='profiled' supports linear residuals and "
                    f"Allen-Cahn (Gauss-Newton); {self.eq_type!r} is "
                    f"neither (use u_mode='adam')")
            # Allen-Cahn: warm-started Gauss-Newton — each iteration is
            # one linear profiled solve with the diagonal weight
            # D = 3U^2 - 1 and affine target f + 2U^3 (see Solver1D)
            self.profile_newton_iters = int(
                config.get("profile_newton_iters", 3))
            # Objective: "marginal" (default) adds the separable Occam
            # surrogate (ops/kron_profile.occam_logdet_2d) — see Solver1D
            # for the properness rationale; "map" keeps the reference's
            # joint-MAP form
            self.profile_objective = str(
                config.get("profile_objective", "marginal"))
            if self.profile_objective not in ("map", "marginal"):
                raise ValueError(
                    f"unknown profile_objective "
                    f"{self.profile_objective!r} (use 'marginal' or 'map')")
            if self.profile_objective == "marginal" \
                    and not config.get("logdet", True):
                raise ValueError(
                    "profile_objective='marginal' needs the log-determinant "
                    "terms (set logdet: true or profile_objective: 'map')")
            # Evidence tempering: static weight on the Occam correction
            # (0 = improper MAP-like, 1 = exact marginal); scheduled
            # across budget segments by --occam-schedule (experiment.py)
            self.occam_weight = float(config.get("occam_weight", 1.0))
            # Continuous tempering ramp from ep0 (see Solver1D.__init__):
            # weight min(1, epoch/R) on the Occam correction via a frozen
            # device-side counter leaf
            self.occam_ramp_epochs = int(config.get("occam_ramp_epochs", 0))
            if self.occam_ramp_epochs > 0:
                freeze = list(freeze or []) + ["_epoch"]
            # Occam-term mode: "separable" (the eigenbasis surrogate — the
            # only option at the production 400^2) or "exact" (dense
            # 0.5 logdet S via Cholesky, the surrogate's ground truth —
            # O((N1 N2)^3), small grids only)
            # "slq" = the separable value plus a stochastic Lanczos
            # estimate of the remainder logdet(P^-1/2 S P^-1/2) — the
            # production-scale correction for the surrogate's measured
            # bias at sharp hyperparameters (tools/probe_occam2d.py);
            # probe/iteration counts ride the slq_probes/slq_iters knobs
            self.occam_2d = str(config.get("occam_2d", "separable"))
            if self.occam_2d not in ("separable", "exact", "slq"):
                raise ValueError(f"unknown occam_2d {self.occam_2d!r} "
                                 f"(use 'separable', 'slq' or 'exact')")
            if self.occam_2d == "exact" and self.N1 * self.N2 > 4096:
                raise ValueError(
                    f"occam_2d='exact' assembles the dense "
                    f"({self.N1 * self.N2})^2 normal operator — use it at "
                    f"N1*N2 <= 4096 (64^2) only; the production tier is "
                    f"the separable surrogate")
            # Same tier rule as 1D: the envelope gradient is taken AT the
            # sharp conditional optimum, where refined-tier logdet-gradient
            # error overwhelms the signal — the loss factors run wide-exact
            # (f64; blocked HLO on TPU) and U itself stays f64.
            self._wide_exact = self.wide_train
            if not (p.dtype == jnp.float64 or self.wide_train):
                raise ValueError(
                    "u_mode='profiled' needs f64-quality solves: use "
                    "dtype 'float64' (CPU) or 'refined' (TPU)")
            freeze = list(freeze or []) + ["U"] \
                + (["beta"] if self.n_beta else [])
            wd = jnp.float64 if self.wide_train else p.dtype
            # Boundary mask/target grids.  The reference's boundary vector
            # hstacks the four edges (code/model_GP_solver_2d.py:127), so
            # corners appear twice: the mask r_i + c_j reproduces that
            # double weight exactly.
            m = np.zeros((self.N1, self.N2))
            m[0, :] += 1.0
            m[-1, :] += 1.0
            m[:, 0] += 1.0
            m[:, -1] += 1.0
            bc = np.asarray(problem.bc_vals, np.float64)
            B = np.zeros((self.N1, self.N2))
            B[0, :] = bc[:self.N2]
            B[-1, :] = bc[self.N2:2 * self.N2]
            B[:, 0] = bc[2 * self.N2:2 * self.N2 + self.N1]
            B[:, -1] = bc[2 * self.N2 + self.N1:]
            self._bc_mask = jnp.asarray(m, wd)
            self._bc_grid = jnp.asarray(B, wd)
            self.profile_cg_iters = int(config.get("profile_cg_iters", 60))

            # Projected ascent on the precisions (see Solver1D: with U
            # profiled the MAP in (tau, v) is improper).
            clip = float(config.get("profile_clip", 20.0))

            def _prepare(params):
                params = {**params,
                          "log_tau": jnp.clip(params["log_tau"],
                                              -clip, clip),
                          "log_v": jnp.clip(params["log_v"], -clip, clip)}
                if self.n_beta:
                    V, beta = self._u_star(params)
                    return {**params,
                            "U": jax.lax.stop_gradient(V),
                            "beta": jax.lax.stop_gradient(beta)}
                return {**params, "U": jax.lax.stop_gradient(
                    self._u_star(params))}

            self._prepare_step = _prepare
        elif self.u_mode != "adam":
            raise ValueError(f"unknown u_mode {self.u_mode!r}")

        from gphm_tpu.models.base import freezable_adam
        self.optimizer = freezable_adam(
            config["lr"], freeze,
            decay_steps=config.get("lr_decay_steps"),
            lr_floor=config.get("lr_decay", 1.0))

        # solve mode: "cholesky" (dense factors, exact logdet — reference
        # parity) or "cg" (Kronecker-matvec CG path for beyond-reference
        # grids). CG is preconditioned by a fast f32 Cholesky factor by
        # default (config cg_precond) — unpreconditioned f32 CG diverges at
        # the production conditioning (cond(K) ~ 1e7; NaN at 512^2, round-1
        # PARITY) while PCG contracts ~15x/iteration (ops/refined.py). The
        # factor also supplies the log-determinant (value from its diagonal,
        # gradient K^-1 via PCG), so preconditioned CG optimizes the SAME
        # objective as the dense path — logdet no longer has to be disabled.
        # cg_precond=False keeps the strictly factorization-free operator
        # (requires logdet=False; use ops/slq.py for a stochastic logdet).
        self.solve_mode = str(config.get("solve", "cholesky"))
        self.cg_tol = float(config.get("cg_tol", 1e-6))
        self.cg_maxiter = int(config.get("cg_maxiter", 1000))
        self.cg_precond = bool(config.get("cg_precond", True))
        self.cg_iters = int(config.get(
            "cg_iters", p.refine_iters if p.refine_iters else 4))
        # logdet_mode: "exact" (from a factor) or "slq" (stochastic Lanczos
        # quadrature, ops/slq.py) — the strictly matvec-only completion for
        # unpreconditioned CG
        self.logdet_mode = str(config.get("logdet_mode", "exact"))
        self.slq_probes = int(config.get("slq_probes", 8))
        self.slq_iters = int(config.get("slq_iters", 30))
        if self.solve_mode == "cg" and self.logdet_flag \
                and not self.cg_precond and self.logdet_mode != "slq":
            raise ValueError(
                "solve='cg' with cg_precond=False has no factor for an "
                "exact log-determinant: set logdet: false, keep "
                "cg_precond: true, or set logdet_mode: 'slq'")
        if self.logdet_mode == "slq" and (self.solve_mode != "cg"
                                          or self.cg_precond):
            # the SLQ branch only exists on the matvec-only tier; anywhere a
            # factor exists the exact logdet is strictly better — reject the
            # combination instead of silently measuring the wrong estimator
            raise ValueError(
                "logdet_mode='slq' is the matvec-only completion: it "
                "requires solve: 'cg' with cg_precond: false (a "
                "factor-bearing mode already has the exact logdet)")

        # predict-time solves are widened to f64 when x64 is live (see
        # Solver1D.__init__: f32 predict solves can misreport a correctly
        # trained model)
        self.eval_solve_dtype = (self.policy.solve_dtype
                                 or (jnp.float64
                                     if jax.config.jax_enable_x64 else None))

        self.loss = jax.jit(self._loss)
        self.predict = jax.jit(self._predict)
        self.criterion = jax.jit(self._criterion)
        self.eval_err = jax.jit(self._eval_err)

    # ------------------------------------------------------------------
    def _K_and_Kd(self, x, axis, kernel_paras):
        """Per-dimension covariance + derivative cross-covariance (wide
        tier when refining)."""
        K = axis.gram(self.kernel, kernel_paras, jitter=self.jitter,
                      wide=self.wide_train)
        Kd = axis.gram(self.kernel, kernel_paras, deriv=self.deriv_order,
                       wide=self.wide_train)
        return K, Kd

    def _psd_solve(self, K, B):
        """K^-1 B under the configured solve mode. Returns (X, logdet);
        logdet is None only for unpreconditioned CG (no factor exists)."""
        if self.solve_mode == "cg":
            if not self.cg_precond and self.logdet_flag \
                    and self.logdet_mode == "slq":
                # matvec-only tier: CG solve + stochastic Lanczos-quadrature
                # logdet on fixed Rademacher probes (ops/slq.py)
                from gphm_tpu.ops.cg import psd_solve_cg
                from gphm_tpu.ops.slq import rademacher_probes, slq_logdet
                X = psd_solve_cg(K, B, self.cg_tol, self.cg_maxiter)
                Z = rademacher_probes(K.shape[-1], self.slq_probes, K.dtype)
                ld = slq_logdet(K, Z, self.slq_iters, self.cg_tol,
                                self.cg_maxiter)
                return X, ld
            if self.cg_precond:
                # f32-factor-preconditioned CG at K's dtype: fixed iteration
                # count (jit-friendly), implicit-diff gradients; the factor
                # doubles as the exact logdet source (ops/refined.py)
                from gphm_tpu.ops.chol import robust_cholesky
                from gphm_tpu.ops.refined import (explicit_inverse,
                                                  pcg_logdet, pcg_solve)
                inner = robust_cholesky(
                    K.astype(jnp.float32), base_jitter=self.policy.jitter,
                    growth=self.policy.jitter_growth,
                    max_tries=self.policy.max_jitter_tries)
                K_adj = K + inner.jitter_used.astype(K.dtype) \
                    * jnp.eye(K.shape[-1], dtype=K.dtype)
                Linv = explicit_inverse(inner.L)
                X = pcg_solve(K_adj, Linv, B.astype(K.dtype), self.cg_iters)
                ld = None
                if self.logdet_flag:
                    ld32 = inner.logdet().astype(K.dtype)
                    ld = pcg_logdet(K_adj, ld32, Linv, self.cg_iters)
                return X, ld
            from gphm_tpu.ops.cg import psd_solve_cg
            return psd_solve_cg(K, B, self.cg_tol, self.cg_maxiter), None
        F = policy_cholesky(K, self.policy)
        return F.solve(B.astype(F.L.dtype)), F.logdet()

    def _loss_solve(self, K, B):
        """Training-loss solve of K: wide-exact in profiled mode (the
        envelope gradient needs f64-quality logdet gradients — see
        Solver1D._loss_factor), the configured solve mode otherwise."""
        if getattr(self, "_wide_exact", False):
            from gphm_tpu.ops.chol import robust_cholesky
            F = robust_cholesky(K, max_tries=0)
            return F.solve(B.astype(K.dtype)), F.logdet()
        return self._psd_solve(K, B)

    def _u_star(self, params):
        """Whitened conditional optimum of the grid latent (u_mode
        'profiled'): returns V* with U* = K1 V* K2 — the params' "U" leaf
        STORES V in profiled mode (same envelope-exactness rationale as the
        1D whitened latent, ops/profile1d.py).  Warm-started
        eigenbasis-preconditioned CG on the matmul-only normal operator
        (ops/kron_profile.py); Allen-Cahn iterates it under damped
        Gauss-Newton."""
        from gphm_tpu.ops.kron_profile import profiled_u_star_2d
        tau = jnp.exp(params["log_tau"])
        v = jnp.exp(params["log_v"])
        wt = self.llk_weight * tau
        kp1, kp2 = params["kernel_paras_1"], params["kernel_paras_2"]
        K1, Kd1 = self._K_and_Kd(self.x_col, self.axis1, kp1)
        K2, Kd2 = self._K_and_Kd(self.y_col, self.axis2, kp2)
        a1 = jnp.asarray(self.beta if self.eq_type == "advection" else 1.0,
                         K1.dtype)
        # warm start: the previous step's optimum IS the stored latent
        V = params["U"].astype(K1.dtype)
        src = self.src_loss.astype(K1.dtype)
        if self.n_beta:
            # joint (V, beta) conditional optimum with the separable trend
            # (ops/kron_profile.profiled_u_beta_star_2d); returns both so
            # _prepare can overwrite the two leaves together
            from gphm_tpu.ops.kron_profile import profiled_u_beta_star_2d
            from gphm_tpu.ops.profile1d import BETA_PRIOR_PREC
            d = K1.dtype
            if self.deriv_order == 2:
                H1D, H2D = self._H1dd, self._H2dd
            else:
                H1D, H2D = self._H1d, self._H2d
            _, V, beta = profiled_u_beta_star_2d(
                K1, Kd1, K2, Kd2,
                self._H1.astype(d), H1D.astype(d),
                self._H2.astype(d), H2D.astype(d),
                self._bc_mask, self._bc_grid, src, wt, v, a1,
                V, params["beta"].astype(d), self.profile_cg_iters,
                jnp.asarray(BETA_PRIOR_PREC, d))
            return (V.astype(params["U"].dtype),
                    beta.astype(params["beta"].dtype))
        if self.eq_type != "allencahn_2d":
            _, V = profiled_u_star_2d(
                K1, Kd1, K2, Kd2, self._bc_mask, self._bc_grid,
                src, wt, v, a1, V, self.profile_cg_iters)
            return V.astype(params["U"].dtype)
        # Allen-Cahn Gauss-Newton: iterate the linear profiled solve with
        # the current diagonal weight and affine target, warm-started in V.
        # As in 1D, raw GN oscillates when the conditional optimum is large,
        # so each iteration line-searches the GN direction on the exact
        # conditional objective over a fixed step grid (eta=0 included:
        # monotone by construction). The residual's linear part and the
        # prior quadratic interpolate in eta, so the search is elementwise
        # on top of the lift matmuls.
        Kd2t = Kd2.T
        etas = jnp.asarray(ETAS, K1.dtype)

        def lin_lift(V):
            return a1 * ((Kd1 @ V) @ K2) + (K1 @ V) @ Kd2t

        U = (K1 @ V) @ K2
        lin = lin_lift(V)

        # lax.fori_loop, NOT a Python loop: the unrolled form lowered
        # profile_newton_iters copies of the CG solve into one program —
        # at newton 6 / cg 100 on the refined tier the remote compile of
        # that program blocked the (serializing) terminal compiler for
        # >45 min and with it every other client (measured live,
        # 2026-08-20). The GN result is consumed under stop_gradient
        # (envelope gradient), so forward-only fori_loop semantics are
        # exactly what is needed.
        def gn_body(_, carry):
            U, V, lin = carry
            Un, Vn = profiled_u_star_2d(
                K1, Kd1, K2, Kd2, self._bc_mask, self._bc_grid,
                src + 2.0 * U ** 3, wt, v, a1, V, self.profile_cg_iters,
                dgrid=3.0 * U ** 2 - 1.0)
            dU, dV = Un - U, Vn - V
            dlin = lin_lift(dV)
            # prior quadratic 0.5 <V_eta, U_eta> expands exactly in eta
            # (V ~ K1^-1 U K2^-1 from the warm-started CG)
            q0, q1a = jnp.sum(V * U), jnp.sum(dV * U)
            q1b, q2 = jnp.sum(V * dU), jnp.sum(dV * dU)

            def phi(eta):
                Ue = U + eta * dU
                r = lin + eta * dlin + Ue ** 3 - Ue - src
                quad = q0 + eta * (q1a + q1b) + eta ** 2 * q2
                # boundary: sum mask U^2 - 2 U (mask b) + const — the
                # mask carries the corner double weight, so b enters
                # masked (same form as the kron_profile rhs)
                return (0.5 * quad + 0.5 * v * jnp.sum(r ** 2)
                        + 0.5 * wt * jnp.sum(
                            (Ue - 2.0 * self._bc_grid) * self._bc_mask * Ue))

            eta = etas[jnp.argmin(jax.vmap(phi)(etas))]
            return U + eta * dU, V + eta * dV, lin + eta * dlin

        _, V, _ = jax.lax.fori_loop(0, self.profile_newton_iters,
                                    gn_body, (U, V, lin))
        return V.astype(params["U"].dtype)

    def _trend_terms(self, params, dtype):
        """(T, T_dx, T_dy) of the separable trend H1 B H2' at ``dtype`` —
        derivative order matches the PDE operator (advection: first).
        (0, 0, 0) when the trend is off."""
        if not self.n_beta:
            return 0.0, 0.0, 0.0
        B = params["beta"].astype(dtype)
        H2t_ = self._H2.astype(dtype).T
        if self.deriv_order == 2:
            Dx, Dy = self._H1dd, self._H2dd
        else:
            Dx, Dy = self._H1d, self._H2d
        T = self._H1.astype(dtype) @ B @ H2t_
        T_dx = Dx.astype(dtype) @ B @ H2t_
        T_dy = self._H1.astype(dtype) @ B @ Dy.astype(dtype).T
        return T, T_dx, T_dy

    def lifts(self, params):
        """Per-dimension solves and derivative lifts of U.

        Whitened (profiled) mode: the "U" leaf stores V = K1^-1 U K2^-1, so
        every lift is a solve-free matmul — U = K1 V K2, U_dx = Kd1 V K2,
        U_dy = K1 V Kd2', and the prior quadratic's factors are
        K1^-1 U = V K2 and K2^-1 U' = (K1 V)' exactly.  Factors are built
        only for the log-determinants."""
        kp1, kp2 = params["kernel_paras_1"], params["kernel_paras_2"]
        K1, Kd1 = self._K_and_Kd(self.x_col, self.axis1, kp1)
        K2, Kd2 = self._K_and_Kd(self.y_col, self.axis2, kp2)
        if self.whitened:
            from gphm_tpu.ops.chol import robust_cholesky
            V = params["U"].astype(K1.dtype)
            P1 = K1 @ V
            VK2 = V @ K2
            U = P1 @ K2
            U_dx = Kd1 @ VK2
            U_dy = P1 @ Kd2.T
            if self.n_beta:
                # trend rides on top of the GP part: boundary/residual act
                # on the TOTAL, the prior quadratic stays on (V, K1 V K2)
                T, T_dx, T_dy = self._trend_terms(params, U.dtype)
                U = U + T
                U_dx = U_dx + T_dx
                U_dy = U_dy + T_dy
            ld1 = ld2 = None
            if self.logdet_flag:
                ld1 = robust_cholesky(K1, max_tries=0).logdet()
                ld2 = robust_cholesky(K2, max_tries=0).logdet()
            return ld1, ld2, VK2, P1.T, U_dx, U_dy, U
        U = params["U"]
        # adam mode stores the TOTAL U; the GP prior centers on the trend,
        # so the per-dimension solves and GP derivative lifts act on
        # G = U - H1 B H2', and the analytic trend derivatives are added
        # back to the lifts (matching the 1D semantics, Solver1D.gaps)
        T, T_dx, T_dy = self._trend_terms(params, U.dtype) if self.n_beta \
            else (0.0, 0.0, 0.0)
        U = U - T if self.n_beta else U
        if self.N1 == self.N2 and self.solve_mode == "cholesky" \
                and self.config.get("batched_chol", False) \
                and not getattr(self, "_wide_exact", False) \
                and not getattr(self.policy, "refine_iters", 0):
            # (the refined tier's PCG custom VJPs are unbatched — route the
            # refined policy through the two independent factors below)
            # optional: stack the two per-dim factorizations into one batched
            # Cholesky. Measured ~8% SLOWER than two independent factors on
            # TPU v5e (XLA does not parallelize the chol batch), so off by
            # default; kept as a config toggle for other backends
            K = jnp.stack([K1, K2])
            B = jnp.stack([U, U.T])
            F = policy_cholesky(K, self.policy)
            X = F.solve(B.astype(F.L.dtype))
            ld = F.logdet()
            K1inv_U, K2inv_Ut = X[0], X[1]
            ld1, ld2 = ld[0], ld[1]
        else:
            K1inv_U, ld1 = self._loss_solve(K1, U)
            K2inv_Ut, ld2 = self._loss_solve(K2, U.T)
        # GP lifts on the de-trended part + analytic trend derivatives;
        # the returned U is the TOTAL (boundary/residual act on it)
        U_dx = Kd1 @ K1inv_U + T_dx     # U_xx (or U_x for advection)
        U_dy = (Kd2 @ K2inv_Ut).T + T_dy  # U_yy (or U_y)
        return ld1, ld2, K1inv_U, K2inv_Ut, U_dx, U_dy, params["U"]

    def residual(self, U, U_dx, U_dy):
        if self.eq_type == "poisson_2d":
            return U_dx + U_dy - self.src_loss
        if self.eq_type == "allencahn_2d":
            return U_dx + U_dy + U * (U ** 2 - 1) - self.src_loss
        if self.eq_type == "advection":
            return self.beta * U_dx + U_dy - self.src_loss
        raise NotImplementedError(self.eq_type)

    def boundary_slice(self, U):
        """Four grid edges in the reference order
        (code/model_GP_solver_2d.py:127)."""
        return jnp.hstack((U[0, :], U[-1, :], U[:, 0], U[:, -1]))

    def gaps(self, params):
        ld1, ld2, K1inv_U, K2inv_Ut, U_dx, U_dy, U = self.lifts(params)
        boundary_gap = jnp.sum(
            (self.boundary_slice(U) - self.bc_vals) ** 2)
        eq_gap = jnp.sum(self.residual(U, U_dx, U_dy) ** 2)
        return ld1, ld2, K1inv_U, K2inv_Ut, boundary_gap, eq_gap

    def _loss(self, params):
        ld1, ld2, K1inv_U, K2inv_Ut, U_dx, U_dy, U = self.lifts(params)
        boundary_gap = jnp.sum(
            (self.boundary_slice(U) - self.bc_vals) ** 2)
        eq_gap = jnp.sum(self.residual(U, U_dx, U_dy) ** 2)
        # Kronecker prior (reference: code/model_GP_solver_2d.py:157-162);
        # ld is None only for unpreconditioned CG (logdet=False enforced)
        if ld1 is None:
            log_prior = -0.5 * jnp.sum(K1inv_U * K2inv_Ut.T)
        else:
            log_prior = -0.5 * self.N2 * ld1 * self.logdet_flag \
                - 0.5 * self.N1 * ld2 * self.logdet_flag \
                - 0.5 * jnp.sum(K1inv_U * K2inv_Ut.T)
        if self.n_beta:
            # weak proper Gaussian prior on the trend coefficients with its
            # normalizer (same convention as Solver1D / the 1D brute-force
            # marginal identity)
            from gphm_tpu.ops.profile1d import BETA_PRIOR_PREC as _eps
            beta = params["beta"].astype(U.dtype)
            log_prior = log_prior - 0.5 * _eps * jnp.sum(beta ** 2) \
                + 0.5 * beta.size * np.log(_eps)
        log_boundary_ll = 0.5 * self.Nb * params["log_tau"] \
            - 0.5 * jnp.exp(params["log_tau"]) * boundary_gap
        eq_ll = 0.5 * self.Nc * params["log_v"] \
            - 0.5 * jnp.exp(params["log_v"]) * eq_gap
        if getattr(self, "profile_objective", "map") != "marginal":
            return -(log_prior + log_boundary_ll * self.llk_weight + eq_ll)
        # Marginal objective (see Solver1D._loss and
        # ops/kron_profile.occam_logdet_2d): Occam surrogate
        # 0.5 logdet S - logdet(K2 (x) K1), boundary temper inside the
        # precision with its true normalizer
        from gphm_tpu.ops.kron_profile import occam_logdet_2d
        kp1, kp2 = params["kernel_paras_1"], params["kernel_paras_2"]
        K1, Kd1 = self._K_and_Kd(self.x_col, self.axis1, kp1)
        K2, Kd2 = self._K_and_Kd(self.y_col, self.axis2, kp2)
        wt = self.llk_weight * jnp.exp(params["log_tau"])
        v = jnp.exp(params["log_v"])
        a1 = jnp.asarray(self.beta if self.eq_type == "advection" else 1.0,
                         K1.dtype)
        dbar = (jnp.mean(3.0 * U ** 2 - 1.0)
                if self.eq_type == "allencahn_2d" else 0.0)
        lb_marg = 0.5 * self.Nb * jnp.log(wt) - 0.5 * wt * boundary_gap
        base = -(log_prior + lb_marg + eq_ll)
        # Evidence tempering (see Solver1D._loss): ow scales the whole
        # Occam correction (0.5 logdet S - logdet G); 0 skips it entirely.
        # With occam_ramp_epochs set, ow becomes the traced continuous
        # ramp min(1, epoch/R) (device-side counter, see make_step_fn).
        ow = float(getattr(self, "occam_weight", 1.0))
        ramp = int(getattr(self, "occam_ramp_epochs", 0))
        if ow == 0.0 and not ramp:
            return base
        if ramp:
            ow = jnp.clip(
                jax.lax.stop_gradient(params["_epoch"]).astype(U.dtype)
                / ramp, 0.0, 1.0) * (ow if ow > 0.0 else 1.0)
        if getattr(self, "occam_2d", "separable") == "exact":
            # dense ground-truth Occam term (small grids): the Laplace
            # weight for Allen-Cahn uses the full GN diagonal 3U^2 - 1,
            # not its mean, and the trend directions (if any) enter through
            # the exact augmented system with the V-beta coupling block
            from gphm_tpu.ops.kron_profile import occam_logdet_2d_exact
            from gphm_tpu.ops.profile1d import BETA_PRIOR_PREC
            dgrid = (jax.lax.stop_gradient(3.0 * U ** 2 - 1.0)
                     if self.eq_type == "allencahn_2d" else None)
            d = K1.dtype
            if self.n_beta:
                H1D, H2D = ((self._H1dd, self._H2dd)
                            if self.deriv_order == 2
                            else (self._H1d, self._H2d))
                occ = occam_logdet_2d_exact(
                    K1, Kd1, K2, Kd2, self._bc_mask.astype(d), a1, wt, v,
                    dgrid=dgrid, H1=self._H1.astype(d), H1D=H1D.astype(d),
                    H2=self._H2.astype(d), H2D=H2D.astype(d),
                    eps=jnp.asarray(BETA_PRIOR_PREC, d))
            else:
                occ = occam_logdet_2d_exact(
                    K1, Kd1, K2, Kd2, self._bc_mask.astype(d), a1, wt, v,
                    dgrid=dgrid)
            return base \
                + ow * (occ - (self.N2 * ld1 + self.N1 * ld2))
        if self.occam_2d == "slq":
            # separable value + stochastic Lanczos estimate of the
            # remainder the surrogate drops (fixed probes; Hutchinson
            # gradient through the same preconditioned CG). Trend
            # directions still enter through the additive beta block
            # below (the V-beta coupling stays dropped on this tier).
            from gphm_tpu.ops.kron_profile import occam_logdet_2d_slq
            occ = occam_logdet_2d_slq(
                K1, Kd1, K2, Kd2, a1, wt, v, dbar=dbar,
                probes=self.slq_probes, lanczos_iters=self.slq_iters,
                cg_iters=self.profile_cg_iters,
                cv=bool(self.config.get("slq_cv", True)))
        else:
            occ = occam_logdet_2d(K1, Kd1, K2, Kd2, a1, wt, v, dbar=dbar)
        if self.n_beta:
            # trend directions of the Occam surrogate: 0.5 logdet of the
            # exact dense beta-block (ops/kron_profile.trend_block — the
            # coupling to V is dropped, consistent with the separable
            # surrogate), so the evidence prices the trend's 9 integrated
            # directions like the 1D augmented logdet does
            from gphm_tpu.ops.kron_profile import trend_block
            from gphm_tpu.ops.profile1d import BETA_PRIOR_PREC
            d = K1.dtype
            if self.deriv_order == 2:
                H1D, H2D = self._H1dd, self._H2dd
            else:
                H1D, H2D = self._H1d, self._H2d
            r1 = jnp.zeros((self.N1,), d).at[0].set(1.0).at[-1].set(1.0)
            r2 = jnp.zeros((self.N2,), d).at[0].set(1.0).at[-1].set(1.0)
            Qb = trend_block(self._H1.astype(d), H1D.astype(d),
                             self._H2.astype(d), H2D.astype(d),
                             r1, r2, wt, v, a1,
                             jnp.asarray(BETA_PRIOR_PREC, d))
            # Cholesky-based logdet: stock slogdet lowers to XLA's
            # LuDecomposition, which TPU implements for f32 only
            from gphm_tpu.ops.chol import robust_cholesky
            occ = occ + 0.5 * robust_cholesky(Qb, max_tries=0).logdet()
        return base + ow * (occ - (self.N2 * ld1 + self.N1 * ld2))

    def _predict(self, params):
        """Per-dimension cross-kernel posterior mean
        (reference: code/model_GP_solver_2d.py:185-220). Grams, cross-Grams,
        and solves all run at the wide (f64) tier when available — f32
        posterior solves can misreport a correctly trained model.

        Whitened (profiled) mode: the "U" leaf stores V = K1^-1 U K2^-1, so
        the posterior mean is Kmn1 V Kmn2' exactly — no solves at all."""
        sd = self.eval_solve_dtype
        wide = sd is not None
        kp1, kp2 = params["kernel_paras_1"], params["kernel_paras_2"]
        if self.whitened:
            Kmn1 = self.cross1.eval(self.kernel, kp1, wide=wide)
            Kmn2 = self.cross2.eval(self.kernel, kp2, wide=wide)
            V = params["U"].astype(Kmn1.dtype)
            preds = (Kmn1 @ V) @ Kmn2.T
            if self.n_beta:
                B = params["beta"].astype(preds.dtype)
                preds = preds + self._H1t.astype(preds.dtype) @ B \
                    @ self._H2t.astype(preds.dtype).T
            return preds
        K1 = self.axis1.gram(self.kernel, kp1, jitter=self.jitter, wide=wide)
        if sd is not None:
            K1 = K1.astype(sd)
        UU = params["U"].astype(K1.dtype)
        if self.n_beta:
            # GP prior centers on the trend: posterior-mean solves act on
            # the de-trended part; the trend re-enters on the test grid
            B = params["beta"].astype(K1.dtype)
            UU = UU - self._H1.astype(K1.dtype) @ B \
                @ self._H2.astype(K1.dtype).T
        Kmn1 = self.cross1.eval(self.kernel, kp1, wide=wide)
        M1 = Kmn1.astype(K1.dtype) @ self._psd_solve(K1, UU)[0]
        K2 = self.axis2.gram(self.kernel, kp2, jitter=self.jitter, wide=wide)
        if sd is not None:
            K2 = K2.astype(sd)
        Kmn2 = self.cross2.eval(self.kernel, kp2, wide=wide)
        M2 = self._psd_solve(K2, M1.T.astype(K2.dtype))[0]
        preds = (Kmn2.astype(M2.dtype) @ M2).T
        if self.n_beta:
            B = params["beta"].astype(preds.dtype)
            preds = preds + self._H1t.astype(preds.dtype) @ B \
                @ self._H2t.astype(preds.dtype).T
        return preds

    def _eval_err(self, params):
        diff = self._predict(params).reshape(-1) - self.u_test.reshape(-1)
        return jnp.linalg.norm(diff) / jnp.linalg.norm(self.u_test)

    def _criterion(self, params):
        _, _, _, _, boundary_gap, eq_gap = self.gaps(params)
        return boundary_gap / self.Nb + eq_gap / self.Nc

    # ------------------------------------------------------------------
    def init_params(self):
        """Reference init (code/model_GP_solver_2d.py:245-261)."""
        d = self.policy.dtype
        Q = int(self.config["Q"])
        fs = float(self.config["freq_scale"])
        freqs1 = freqs2 = None
        if self.config.get("freq_init", "linspace") == "spectral":
            # per-axis periodogram placement (ops/kernels.py spectral_freqs):
            # the Kronecker kernel factors per dimension, so each axis gets
            # the spectrum of the source restricted to that axis
            from gphm_tpu.ops.kernels import spectral_freqs
            src = getattr(self.problem, "src64", None)
            src = np.asarray(src if src is not None else self.src)
            x1 = getattr(self.problem, "x_col64", None)
            x1 = x1 if x1 is not None else np.asarray(self.x_col)
            x2 = getattr(self.problem, "y_col64", None)
            x2 = x2 if x2 is not None else np.asarray(self.y_col)
            sig1, sig2 = src, src.T
            if np.max(np.abs(src)) <= 1e-12 * max(1.0, float(
                    np.max(np.abs(np.asarray(self.bc_vals))))):
                # Homogeneous-source PDEs (advection: beta u_x + u_y = 0,
                # reference: code/model_GP_solver_advection.py:354-362)
                # have no source spectrum to read — but the boundary EDGES
                # are known data carrying each axis's spectrum directly:
                # u(x, y0) over the x grid and u(x0, y) over the y grid
                # (for u = sin(x - beta y), the y edge shows the
                # beta-scaled line at beta/2pi cycles/unit exactly).
                # Boundary block layout: [U[0,:], U[-1,:], U[:,0], U[:,-1]]
                # (code/model_GP_solver_2d.py:127).
                bc = np.asarray(self.bc_vals, np.float64)
                sig1 = bc[2 * self.N2:2 * self.N2 + self.N1]   # u(x, y0)
                sig2 = bc[:self.N2]                            # u(x0, y)
            freqs1 = spectral_freqs(x1, sig1, Q, fs)
            freqs2 = spectral_freqs(x2, sig2, Q, fs)
        # profiled mode: the "U" leaf carries the whitened optimum V,
        # consumed by the loss through K1 V K2 — it stays at the wide tier
        # (same rationale as Solver1D.init_params)
        ud = jnp.float64 if (self.u_mode == "profiled"
                             and self.wide_train) else d
        params = {
            "log_tau": jnp.zeros((), d),
            "log_v": jnp.zeros((), d),
            "kernel_paras_1": init_mixture_params(Q, fs, d, freqs=freqs1),
            "kernel_paras_2": init_mixture_params(Q, fs, d, freqs=freqs2),
            "U": jnp.zeros((self.N1, self.N2), ud),
        }
        if self.n_beta:
            # separable trend coefficient grid, an ordinary Adam leaf
            params["beta"] = jnp.zeros((self.n_beta, self.n_beta), ud)
        if getattr(self, "occam_ramp_epochs", 0) > 0:
            # Occam tempering ramp counter (see Solver1D.init_params)
            params["_epoch"] = jnp.zeros((), jnp.float32)
        return params

    def param_log(self, params):
        out = {}
        for tag in ("1", "2"):
            kp = params[f"kernel_paras_{tag}"]
            out[f"w_list_k{tag}"] = jnp.exp(kp["log-w"])
            out[f"freq_list_k{tag}"] = kp["freq"]
            out[f"ls_list_k{tag}"] = jnp.exp(kp["log-ls"])
        return out

    def train(self, nepoch: int, seed: int = 0, verbose: bool = True,
              on_eval=None, mode: str = "auto", on_checkpoint=None,
              nan_policy: str = "warn", init_state=None,
              start_epoch: int = 0, min_err0: float = 2.0,
              error_increase_count0: int = 0, mesh=None,
              stop_epoch=None, n_evals: int = 20) -> TrainResult:
        del seed  # deterministic; see Solver1D.train
        if start_epoch or init_state is not None or stop_epoch is not None \
                or n_evals != 20:
            mode = "chunked"  # resume keeps the absolute eval cadence
        if on_checkpoint is not None or nan_policy in ("raise", "rollback"):
            mode = "chunked"  # fused has no checkpoints / NaN guard
        # profiled mode shards too: the per-axis eigh and factorizations are
        # replicated (N x N operands), the grid-shaped CG state and all
        # lifts are column-sharded. One honesty note (tested): the
        # warm-started CG at cond(S) ~ 1e12 amplifies sharded-reduction
        # ordering noise, so sharded profiled trajectories match
        # single-device statistically (percent-level) rather than to 1e-10
        # like the adam path.
        if mesh is not None:
            # sharded training (SURVEY §2.4 TP): U columns are committed to
            # the mesh's model axis; the lifts (K_d K^-1 U) are
            # column-parallel, and GSPMD inserts the ICI all-gathers for the
            # row-space contractions (U @ K2-style products)
            mode = "chunked"
        # early stopping is active only for Poisson/AC 2D with tol > 0
        # (code/model_GP_solver_2d.py:327-332); otherwise fuse the whole run
        stop_active = self.eq_type != "advection" \
            and float(self.config.get("tol", -1.0)) > 0
        # auto caps fused programs at 20k epochs (long single executions can
        # trip infrastructure timeouts; see Solver1D.train)
        if mode == "auto":
            mode = ("fused" if not stop_active and nepoch % 20 == 0
                    and 20 <= nepoch <= 20000 else "chunked")
        if mode == "fused":
            from gphm_tpu.models.base import fused_train
            return fused_train(solver=self, nepoch=nepoch, verbose=verbose,
                               on_eval=on_eval)
        params = init_state[0] if init_state else self.init_params()
        opt_state = (init_state[1] if init_state
                     else self.optimizer.init(params))
        if mesh is not None:
            from gphm_tpu.parallel.mesh import state_placer
            place = state_placer(mesh, params)
            params, opt_state = place(params), place(opt_state)
        state = TrainState(
            params=params,
            opt_state=opt_state,
            run_chunk=make_chunk_runner(self._loss, self.optimizer,
                                        getattr(self, "_prepare_step", None)),
            eval_fn=self.eval_err,
            criterion_fn=self.criterion,
            param_log_fn=jax.jit(self.param_log),
            opt_init=self.optimizer.init,
        )
        # early stopping: active for Poisson/AC when tol > 0
        # (code/model_GP_solver_2d.py:327-332); the advection reference has it
        # commented out (code/model_GP_solver_advection.py:322-328)
        stop_mode = "off" if self.eq_type == "advection" else "tol"
        return chunked_train(
            state=state, nepoch=nepoch,
            tol=float(self.config.get("tol", -1.0)),
            early_stop_mode=stop_mode,
            on_eval=on_eval, on_checkpoint=on_checkpoint,
            nan_policy=nan_policy, start_epoch=start_epoch,
            stop_epoch=stop_epoch,
            min_err0=min_err0, error_increase_count0=error_increase_count0,
            max_launch=200 if self.wide_train else 5000,
            n_evals=n_evals, verbose=verbose,
            final_state=str(self.config.get("final_params", "last")))
