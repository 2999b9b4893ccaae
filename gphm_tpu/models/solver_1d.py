"""1D GP-HM solver: Poisson (u_xx = f) and Allen-Cahn (u_xx + u(u^2-1) = f).

Capability parity with the reference ``GP_solver_1d_single``
(reference: code/model_GP_solver_1d.py:31-296), redesigned TPU-first:

  * Gram and second-derivative cross-covariance matrices come from the
    closed-form batched kernel layer (one broadcasted VPU pass each) instead of
    vmap-over-N^2 scalar autodiff.
  * One Cholesky factorization per step supplies the solve, the quadratic
    form, and the log-determinant (the reference pays an LU for the solve and
    a second LU for slogdet inside value_and_grad,
    code/model_GP_solver_1d.py:92,135-137).
  * The MAP objective is identical term by term:
        -log_joint,  log_joint = log_prior + llk_weight * log_boundary_ll + eq_ll
        log_prior       = -0.5 logdet(K) * logdet_flag - 0.5 u'K^-1 u
        log_boundary_ll = 0.5 N_b log_tau - 0.5 e^{log_tau} * boundary_gap
        eq_ll           = 0.5 N_col log_v - 0.5 e^{log_v} * eq_gap
    (reference: code/model_GP_solver_1d.py:123-149).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


from gphm_tpu.models.base import TrainResult, TrainState, chunked_train, \
    make_chunk_runner
from gphm_tpu.ops.chol import policy_cholesky
from gphm_tpu.ops.kernels import StationaryKernel, get_kernel, \
    init_mixture_params
from gphm_tpu.precision import Policy, default_policy
from gphm_tpu.problems.equations import Problem1D


class Solver1D:
    """Functional solver: all hot paths are pure jitted functions."""

    def __init__(self, problem: Problem1D, kernel, config: dict,
                 policy: Optional[Policy] = None):
        self.problem = problem
        self.kernel: StationaryKernel = (
            get_kernel(kernel) if isinstance(kernel, str) else kernel)
        self.config = dict(config)
        self.policy = (policy or default_policy()).activate()
        p = self.policy

        # Refined tier ("dtype: refined"): hot-loop Grams/residuals at the
        # wide (f64) tier, factorizations in fast native f32 with f64-residual
        # refinement sweeps (ops/refined.py) — ~f64 forward error at ~f32
        # cost. Replaces the reference's global float64
        # (reference: code/kernel_matrix.py:6-7) on TPU.
        self.wide_train = bool(p.refine_iters) and jax.config.jax_enable_x64

        self.X_col = jnp.asarray(problem.X_col, p.dtype)
        self.src = jnp.asarray(problem.src, p.dtype).reshape(-1, 1)
        src64 = getattr(problem, "src64", None)
        self.src_loss = (jnp.asarray(src64, jnp.float64).reshape(-1, 1)
                         if self.wide_train and src64 is not None
                         else self.src)
        self.bc_idx = np.asarray(problem.bc_idx)
        self.bc_vals = jnp.asarray(problem.bc_vals, p.dtype).reshape(-1)
        self.X_test = jnp.asarray(problem.X_test, p.dtype)
        self.u_test = jnp.asarray(problem.u_test, p.dtype)
        self.N_col = int(self.X_col.shape[0])
        self.N_b = int(self.bc_vals.shape[0])

        # Gram builders own the difference representation: Toeplitz lags on
        # uniform grids (O(NQ) kernel evals — all shipped configs), two-float
        # lags for exact-phase f32 training, f64 lags for honest evals.
        from gphm_tpu.ops.gram import AxisGram, CrossGram, resolve_phase_exact
        phase_exact = resolve_phase_exact(config.get("phase_exact", "auto"))
        self.axis = AxisGram(
            self.X_col, p.dtype, x64=getattr(problem, "X_col64", None),
            toeplitz=config.get("toeplitz", "auto"), phase_exact=phase_exact)
        self.cross = CrossGram(
            self.X_test, self.X_col, p.dtype,
            x1_64=getattr(problem, "X_test64", None),
            x2_64=getattr(problem, "X_col64", None), phase_exact=phase_exact)
        self.toeplitz = self.axis.toeplitz

        self.jitter = float(config.get("jitter", 1e-6))
        self.llk_weight = float(config["llk_weight"])
        self.logdet_flag = float(bool(config.get("logdet", True)))
        self.eq_type = problem.eq_type

        # Polynomial mean functions (universal kriging, ops/meanfn.py):
        # u = H beta + GP. The principled replacement for the reference's
        # two-GP smooth-residual trick on multi-scale sources — the trend
        # is fitted jointly (profiled in closed form / trained by Adam)
        # with no residual-noise-floor coupling. mean_poly = trend degree,
        # -1 (default) = off.
        self.mean_poly = int(config.get("mean_poly", -1))
        self.n_beta = self.mean_poly + 1 if self.mean_poly >= 0 else 0
        if self.n_beta:
            from gphm_tpu.ops.meanfn import poly_basis
            xc = getattr(problem, "X_col64", None)
            xc = np.asarray(problem.X_col if xc is None else xc, np.float64)
            xt = getattr(problem, "X_test64", None)
            xt = np.asarray(problem.X_test if xt is None else xt, np.float64)
            dom = (float(xc.min()), float(xc.max()))
            # the test grid shares the collocation-domain affine map (both
            # grids MUST use one map); monomials extrapolate as |t|^degree
            # outside it, so warn when X_test leaves the collocation hull
            # by more than 5% of its width (advisor round-2 finding)
            margin = 0.05 * (dom[1] - dom[0])
            if xt.min() < dom[0] - margin or xt.max() > dom[1] + margin:
                import warnings
                warnings.warn(
                    f"mean_poly: X_test [{xt.min():.4g}, {xt.max():.4g}] "
                    f"extends beyond the collocation hull [{dom[0]:.4g}, "
                    f"{dom[1]:.4g}]; the degree-{self.mean_poly} trend "
                    f"extrapolates there and its conditioning degrades")
            H, _, Hdd = poly_basis(xc, self.mean_poly, dom)
            Ht, _, _ = poly_basis(xt, self.mean_poly, dom)
            # stored f64, cast at use (XLA constant-folds the casts)
            self._H64 = jnp.asarray(H)
            self._Hdd64 = jnp.asarray(Hdd)
            self._H_test64 = jnp.asarray(Ht)

        # Profiled-latent mode (u_mode "profiled"): the MAP objective given
        # the kernel hyperparameters is quadratic in u for a linear residual
        # (Poisson) and Gauss-Newton-solvable for Allen-Cahn, so instead of
        # dragging 400+ latent values along with Adam (the reference trains
        # u by gradient descent for 1e5-1e6 epochs,
        # code/model_GP_solver_1d.py:151-158) each step writes the
        # conditional optimum in whitened coordinates (ops/profile1d.py)
        # and descends only on (kernel_paras, log_tau, log_v) with the
        # envelope-theorem gradient (grad_ut L(ut*) = 0, so
        # stop_gradient(ut*) plus the standard loss gradient IS the
        # profiled gradient). Measured: reaches the reference's 1e5-epoch
        # error floor in ~1e3 steps on poisson_1d configs (PARITY round 2).
        self.u_mode = str(config.get("u_mode", "adam"))
        # Profiled mode stores the WHITENED latent ut (u = K ut) in the
        # params' "u" leaf: stationarity of the conditional optimum is
        # achieved in ut coordinates, so the envelope gradient is exact
        # there, and both the loss lifts and prediction become solve-free
        # (ops/profile1d.py).
        self.whitened = self.u_mode == "profiled"
        freeze = config.get("freeze")
        if self.u_mode == "profiled":
            if self.eq_type not in ("poisson_1d", "allencahn_1d"):
                raise ValueError(
                    f"u_mode='profiled' supports linear residuals and "
                    f"Allen-Cahn (Gauss-Newton); {self.eq_type!r} is "
                    f"neither (use u_mode='adam')")
            # Allen-Cahn: the cubic makes the conditional problem
            # nonlinear; u* comes from a few warm-started Gauss-Newton
            # solves of the same SPD form (see _u_star). GN fixed points
            # satisfy grad_u J = 0 exactly (the normal equations ARE the
            # stationarity conditions at convergence), so the envelope
            # gradient stays exact.
            self.profile_newton_iters = int(
                config.get("profile_newton_iters", 3))
            # Objective: "marginal" adds the Gaussian-integral Occam term
            # (0.5 logdet S - logdet K, ops/profile1d.occam_logdet), making
            # the profiled loss the exact negative log marginal likelihood
            # for linear residuals (Laplace for Allen-Cahn) — proper in
            # every hyperparameter.  "map" keeps the reference's joint-MAP
            # form, which is improper once the latent is profiled
            # (measured: mixture weights chase w -> 4e3 / ls -> 5e-3 with
            # MAP -> -inf while rel-L2 sticks at 1.6).
            self.profile_objective = str(
                config.get("profile_objective", "marginal"))
            if self.profile_objective not in ("map", "marginal"):
                raise ValueError(
                    f"unknown profile_objective "
                    f"{self.profile_objective!r} (use 'marginal' or 'map')")
            # Evidence tempering: static weight on the Occam correction
            # (0 = improper MAP-like, 1 = exact marginal); scheduled
            # across budget segments by --occam-schedule (experiment.py)
            self.occam_weight = float(config.get("occam_weight", 1.0))
            # Continuous tempering RAMP from ep0 (round-4 VERDICT #4: the
            # campaign-Z piecewise schedule was a measured double negative
            # — any plausible late window still contains a MAP-gradient
            # segment for the cliff to fire in). occam_ramp_epochs > 0
            # scales the Occam correction by min(1, epoch/R) read from a
            # device-side counter, so the objective is (weakly) proper
            # from the first step and properness grows with no
            # discontinuity anywhere.
            self.occam_ramp_epochs = int(config.get("occam_ramp_epochs", 0))
            if self.occam_ramp_epochs > 0:
                freeze = list(freeze or []) + ["_epoch"]
            if self.profile_objective == "marginal" \
                    and not config.get("logdet", True):
                raise ValueError(
                    "profile_objective='marginal' needs the log-determinant "
                    "terms (set logdet: true or profile_objective: 'map')")
            # Profiled training factors (S and the loss's K) run at the
            # wide tier end to end: the envelope gradient is taken AT the
            # sharp conditional optimum, where the refined tier's f32-factor
            # PCG logdet-gradient error (~1e-3) overwhelms the true signal
            # (measured on TPU: refined-loss profiled training ascends,
            # wide-exact descends identically to CPU f64). On TPU the f64
            # factorization goes through the custom-call-free blocked HLO
            # tier. Prediction/eval keeps the refined path (validated, and
            # the blocked-f64 two-GP eval graph aborts the axon compiler).
            self._wide_exact = self.wide_train
            if not (p.dtype == jnp.float64 or self.wide_train):
                # cond(S) ~ cond(K)^2 (measured ~1e14 at N=400): an f32
                # factorization fails outright and the f32-preconditioned
                # PCG stalls at ~0.4 relative error on u* (the init-phase
                # optimum lives in exactly the directions the jittered
                # preconditioner cannot reach). The S solve therefore
                # always runs at the wide f64 tier — on TPU through the
                # custom-call-free blocked Cholesky (ops/blocked_linalg).
                raise ValueError(
                    "u_mode='profiled' needs f64-quality solves: use "
                    "dtype 'float64' (CPU) or 'refined' (TPU)")
            freeze = list(freeze or []) + ["u"]
            if self.n_beta:
                if self.eq_type != "poisson_1d":
                    raise ValueError(
                        "mean_poly with u_mode='profiled' supports linear "
                        "residuals only (the Gauss-Newton Allen-Cahn path "
                        "does not carry the trend yet); use u_mode='adam'")
                freeze = freeze + ["beta"]
            mask = np.zeros(self.N_col)
            mask[self.bc_idx] = 1.0
            self._bc_mask = jnp.asarray(
                mask, jnp.float64 if self.wide_train else p.dtype)
            b_full = np.zeros(self.N_col)
            b_full[self.bc_idx] = np.asarray(self.bc_vals)
            self._bc_b = jnp.asarray(b_full, self._bc_mask.dtype).reshape(
                -1, 1)

            # With u profiled, the MAP in (tau, v) is improper: bgap/egap
            # can chase the growing precisions toward a degenerate ridge
            # (observed: log_tau -> 37 and the S-solve conditioning
            # collapses). Projected ascent: clip the log-precisions to a
            # box where S stays f64-solvable. At the clip (default 20,
            # tau = 5e8) the stationary boundary/residual gaps are ~1e-8 —
            # far below any target accuracy, so the clip never binds the
            # attainable error.
            clip = float(config.get("profile_clip", 20.0))

            def _prepare(params):
                params = {**params,
                          "log_tau": jnp.clip(params["log_tau"],
                                              -clip, clip),
                          "log_v": jnp.clip(params["log_v"], -clip, clip)}
                if self.n_beta:
                    ut, beta = self._u_beta_star(params)
                    return {**params,
                            "u": jax.lax.stop_gradient(ut),
                            "beta": jax.lax.stop_gradient(beta)}
                return {**params, "u": jax.lax.stop_gradient(
                    self._u_star(params))}

            self._prepare_step = _prepare
        elif self.u_mode != "adam":
            raise ValueError(f"unknown u_mode {self.u_mode!r}")

        # Staged Q ("k0:R" via config staged_q_start/staged_q_epochs, see
        # _kp): works under any u_mode — the gate lives in the kernel-
        # parameter read path. Needs the _epoch counter leaf (shared with
        # the Occam ramp).
        self.staged_q_start = int(config.get("staged_q_start", 0))
        self.staged_q_epochs = int(config.get("staged_q_epochs", 0))
        if self.staged_q_start:
            freeze = list(freeze or []) + ["_epoch"]

        from gphm_tpu.models.base import freezable_adam
        self.optimizer = freezable_adam(
            config["lr"], freeze,
            decay_steps=config.get("lr_decay_steps"),
            lr_floor=config.get("lr_decay", 1.0))

        # Posterior-mean prediction solves always run in f64 when x64 is
        # live: with f32-trained kernels the predict-time K^-1 u can hit
        # cond(K) ~ 1/eps_f32 and report garbage errors for a correctly
        # trained model (observed on advection/sin_add_cos: training-time
        # f32 evals said rel-L2 ~ 1.0 while the same checkpoints evaluate
        # to 1e-3 in f64). Training stays in the policy dtype.
        self.eval_solve_dtype = (self.policy.solve_dtype
                                 or (jnp.float64
                                     if jax.config.jax_enable_x64 else None))

        self.loss = jax.jit(self._loss)
        self.predict = jax.jit(self._predict)
        self.criterion = jax.jit(self._criterion)
        self.eval_err = jax.jit(self._eval_err)

    # ------------------------------------------------------------------
    # model internals
    # ------------------------------------------------------------------
    def _kp(self, params):
        """Kernel parameters with the staged-Q activation gate applied.

        Staged Q (round-4 VERDICT #4, lever 2: "grow the mixture as lines
        lock"): with ``staged_q_start = k0`` and ``staged_q_epochs = R``,
        component i < k0 is active from ep0 and the rest switch on at
        evenly spaced epochs across (0, R], read from the same frozen
        ``_epoch`` counter as the Occam ramp. Inactive components get
        ``log-w - 60`` (weight ~ 1e-26 — numerically absent, gradients
        ~ 0, so Adam leaves them at their spectral-init placement until
        activation). With ``freq_init='spectral'`` the init orders
        components strongest-line-first (priority_order), so activation
        adds pre-placed lines in descending spectral power."""
        kp = params["kernel_paras"]
        k0 = int(getattr(self, "staged_q_start", 0))
        if not k0:
            return kp
        Q = kp["log-w"].shape[0]
        R = int(getattr(self, "staged_q_epochs", 0))
        idx = np.arange(Q)
        act = np.where(idx < k0, 0.0,
                       R * (idx - k0 + 1) / max(Q - k0, 1))
        ep = jax.lax.stop_gradient(params["_epoch"])
        gate = (ep >= jnp.asarray(act, jnp.float32)).astype(
            kp["log-w"].dtype)
        return {**kp, "log-w": kp["log-w"] + (gate - 1.0) * 60.0}

    def _K_and_Kd(self, kernel_paras, deriv: int = 2):
        """Covariance matrix (with jitter) and derivative cross-covariance —
        the training-step hot pair (one fused XLA broadcast each; a
        hand-written Pallas version was measured runtime-identical inside
        the training scan and 25x slower to compile, so it was removed —
        round-1 VERDICT #9). In the refined tier both are built at the wide
        (f64) tier."""
        K = self.axis.gram(self.kernel, kernel_paras, jitter=self.jitter,
                           wide=self.wide_train)
        Kd = self.axis.gram(self.kernel, kernel_paras, deriv=deriv,
                            wide=self.wide_train)
        return K, Kd

    def _factor(self, kernel_paras, solve_dtype=None):
        """Factor of K; with a wider ``solve_dtype`` the Gram itself is
        rebuilt at the wide tier (honest f64 entries, not an f32 cast)."""
        wide = solve_dtype is not None or self.wide_train
        K = self.axis.gram(self.kernel, kernel_paras, jitter=self.jitter,
                           wide=wide)
        if solve_dtype is not None:
            K = K.astype(solve_dtype)
        return policy_cholesky(K, self.policy)

    def _u_star(self, params):
        """Whitened conditional optimum of the latent (u_mode 'profiled').

        Returns ut* with u* = K ut* — the params' "u" leaf STORES ut in
        profiled mode (see ops/profile1d.py: stationarity is achieved in ut
        coordinates, so taking the envelope there is numerically exact,
        while mapping back through K^-1 amplifies the solve floor by
        cond(K)).  Poisson solves the SPD normal equations exactly;
        Allen-Cahn runs warm-started damped Gauss-Newton."""
        from gphm_tpu.ops.profile1d import gauss_newton_ut_star, \
            linear_ut_star
        tau = jnp.exp(params["log_tau"])
        v = jnp.exp(params["log_v"])
        K, Kd = self._K_and_Kd(self._kp(params))
        wt = self.llk_weight * tau
        if self.eq_type == "poisson_1d":
            ut = linear_ut_star(K, Kd, self._bc_mask, self._bc_b,
                                self.src_loss, wt, v, self.jitter)
        else:
            ut = gauss_newton_ut_star(
                K, Kd, self._bc_mask, self._bc_b, self.src_loss, wt, v,
                self.jitter, params["u"].astype(K.dtype).reshape(-1, 1),
                self.profile_newton_iters,
                phi=lambda w: w ** 3 - w,
                dphi=lambda w: 3.0 * w ** 2 - 1.0)
        return ut.astype(params["u"].dtype).reshape(params["u"].shape)

    def _mean_terms(self, params, dtype):
        """(H beta, H'' beta) at ``dtype`` — (0, 0) when the trend is off."""
        if not self.n_beta:
            return 0.0, 0.0
        beta = params["beta"].astype(dtype).reshape(-1, 1)
        return (self._H64.astype(dtype) @ beta,
                self._Hdd64.astype(dtype) @ beta)

    def _u_beta_star(self, params):
        """Joint whitened conditional optimum (ut*, beta*) with the
        polynomial trend (ops/profile1d.linear_ut_beta_star) — p = degree+1
        extra columns on the same SPD system as ``_u_star``."""
        from gphm_tpu.ops.profile1d import linear_ut_beta_star
        tau = jnp.exp(params["log_tau"])
        v = jnp.exp(params["log_v"])
        K, Kd = self._K_and_Kd(self._kp(params))
        wt = self.llk_weight * tau
        ut, beta = linear_ut_beta_star(
            K, Kd, self._H64.astype(K.dtype), self._Hdd64.astype(K.dtype),
            self._bc_mask, self._bc_b, self.src_loss, wt, v, self.jitter)
        return (ut.astype(params["u"].dtype).reshape(params["u"].shape),
                beta.astype(params["beta"].dtype).reshape(
                    params["beta"].shape))

    def trend_ridge_level(self, params):
        """0.0/1.0: which ridge the augmented-trend factorization selects
        at these params (ops/profile1d.trend_ridge_level; diagnostic,
        checkpoint-cadence only)."""
        from gphm_tpu.ops.profile1d import trend_ridge_level
        K, Kd = self._K_and_Kd(self._kp(params))
        wt = self.llk_weight * jnp.exp(params["log_tau"])
        return float(trend_ridge_level(
            K, Kd, self._H64.astype(K.dtype), self._Hdd64.astype(K.dtype),
            self._bc_mask, wt, jnp.exp(params["log_v"]), self.jitter))

    def _u_xx(self, kernel_paras, alpha):
        K_dxx = self.axis.gram(self.kernel, kernel_paras, deriv=2,
                               wide=self.wide_train)
        return K_dxx @ alpha

    def residual(self, u, u_xx):
        """PDE residual at collocation points
        (reference: code/model_GP_solver_1d.py:101-121)."""
        if self.eq_type == "poisson_1d":
            return u_xx - self.src_loss
        if self.eq_type == "allencahn_1d":
            return u_xx + u * (u ** 2 - 1) - self.src_loss
        raise NotImplementedError(self.eq_type)

    def _loss_factor(self, K):
        """Training-loss factor of K: wide-exact in profiled mode (see
        __init__), the policy tier otherwise."""
        if getattr(self, "_wide_exact", False):
            from gphm_tpu.ops.chol import robust_cholesky
            return robust_cholesky(K, max_tries=0)
        return policy_cholesky(K, self.policy)

    def gaps(self, params):
        K, Kd = self._K_and_Kd(self._kp(params))
        mean_u, mean_uxx = self._mean_terms(params, K.dtype)
        if self.whitened:
            # profiled mode stores the whitened latent ut (u = K ut): the
            # lifts need no solve, and the prior quadratic u'K^-1 u becomes
            # the well-conditioned ut'K ut (ops/profile1d.py rationale)
            alpha = params["u"].astype(K.dtype)
            u = K @ alpha + mean_u
            F = self._loss_factor(K)  # log-determinant only
        else:
            # adam mode stores the TOTAL u; the GP prior centers on the
            # trend, so alpha = K^-1 (u - H beta)
            u = params["u"]
            F = self._loss_factor(K)
            alpha = F.solve(u - mean_u if self.n_beta else u)
        u_xx = Kd @ alpha + mean_uxx
        boundary_gap = jnp.sum(
            (u[self.bc_idx].reshape(-1) - self.bc_vals) ** 2)
        eq_gap = jnp.sum(self.residual(u, u_xx) ** 2)
        return F, alpha, u, boundary_gap, eq_gap

    def _loss(self, params):
        F, alpha, u, boundary_gap, eq_gap = self.gaps(params)
        # the GP prior quadratic is on the de-trended part: (u - H beta)'
        # K^-1 (u - H beta) = sum((u - mean_u) * alpha) in both latent
        # representations (whitened: u - mean_u = K ut, alpha = ut)
        mean_u, _ = self._mean_terms(params, u.dtype) if self.n_beta \
            else (0.0, 0.0)
        log_prior = -0.5 * F.logdet() * self.logdet_flag \
            - 0.5 * jnp.sum((u - mean_u) * alpha)
        if self.n_beta:
            # weak proper Gaussian prior on the trend coefficients (with
            # its normalizer, so the marginal brute-force identity is
            # exact; ops/profile1d.BETA_PRIOR_PREC)
            from gphm_tpu.ops.profile1d import BETA_PRIOR_PREC as _eps
            beta = params["beta"].astype(u.dtype)
            log_prior = log_prior - 0.5 * _eps * jnp.sum(beta ** 2) \
                + 0.5 * self.n_beta * np.log(_eps)
        log_boundary_ll = 0.5 * self.N_b * params["log_tau"] \
            - 0.5 * jnp.exp(params["log_tau"]) * boundary_gap
        eq_ll = 0.5 * self.N_col * params["log_v"] \
            - 0.5 * jnp.exp(params["log_v"]) * eq_gap
        if getattr(self, "profile_objective", "map") != "marginal":
            return -(log_prior + log_boundary_ll * self.llk_weight + eq_ll)
        # Exact negative log marginal likelihood (Laplace at the
        # Gauss-Newton optimum for Allen-Cahn): the latent is integrated
        # out analytically, adding the Occam term 0.5 logdet S - logdet K
        # (ops/profile1d.occam_logdet).  The boundary block keeps the
        # reference's precision temper INSIDE the precision (wt = llk *
        # tau) but uses its true Gaussian normalizer 0.5 N_b log wt —
        # multiplying the normalizer by llk_weight as the reference's MAP
        # does (code/model_GP_solver_1d.py:139-141) makes tau ascend 200x
        # faster than the Occam term can saturate it (measured: log_tau
        # rides to the clip and the S conditioning cliff flips a converged
        # run from rel-L2 0.13 to 1.6).  With the true normalizer every
        # hyperparameter direction is proper: as wt or v -> inf the
        # marginal variances saturate at the GP's own.
        from gphm_tpu.ops.profile1d import occam_logdet
        K, Kd = self._K_and_Kd(self._kp(params))
        wt = self.llk_weight * jnp.exp(params["log_tau"])
        v = jnp.exp(params["log_v"])
        B = Kd if self.eq_type == "poisson_1d" \
            else Kd + (3.0 * u ** 2 - 1.0) * K
        lb_marginal = 0.5 * self.N_b * jnp.log(wt) - 0.5 * wt * boundary_gap
        base = -(log_prior + lb_marginal + eq_ll)
        # Evidence tempering (occam_weight / --occam-schedule): scale the
        # whole Occam correction (0.5 logdet S - logdet K) by a static
        # weight. 0 = the improper MAP-like objective with the marginal's
        # boundary normalizer (fast early descent), 1 = the exact marginal;
        # a schedule ramps properness in before the MAP impropriety cliff
        # (the mix_sin shipped default's documented failure) can fire.
        ow = float(getattr(self, "occam_weight", 1.0))
        ramp = int(getattr(self, "occam_ramp_epochs", 0))
        if ow == 0.0 and not ramp:
            return base  # skip the extra S factorization entirely
        H = self._H64.astype(K.dtype) if self.n_beta else None
        Hdd = self._Hdd64.astype(K.dtype) if self.n_beta else None
        corr = occam_logdet(K, B, self._bc_mask, wt, v, self.jitter,
                            H=H, Hdd=Hdd) - F.logdet()
        if ramp:
            # continuous tempering ramp: weight grows 0 -> occam_weight
            # over the first `ramp` epochs (device-side counter, see
            # make_step_fn); max(ow, ...) lets occam_weight < 1 act as a
            # floor-free target, stop_gradient keeps the counter inert
            frac = jnp.clip(
                jax.lax.stop_gradient(params["_epoch"]).astype(corr.dtype)
                / ramp, 0.0, 1.0)
            return base + (frac * (ow if ow > 0.0 else 1.0)) * corr
        return base + ow * corr

    def _predict(self, params, cross=None):
        """Posterior mean at test points: Kmn K^-1 u
        (reference: code/model_GP_solver_1d.py:160-180). Both the Gram and
        the cross-covariance are built at the wide (f64) tier and the solve
        runs there too (see __init__): with f32-trained kernels an f32
        posterior solve can misreport a correctly trained model.

        Profiled mode stores the whitened latent ut = K^-1 u, so the
        posterior mean is Kmn @ ut exactly — no factorization, no solve,
        and no cond(K) amplification at eval time."""
        cr = self.cross if cross is None else cross
        wide = self.eval_solve_dtype is not None
        Kmn = cr.eval(self.kernel, self._kp(params), wide=wide)
        if self.whitened:
            alpha = params["u"].astype(Kmn.dtype)
        else:
            F = self._factor(self._kp(params),
                             solve_dtype=self.eval_solve_dtype)
            uu = params["u"].astype(F.L.dtype)
            if self.n_beta:
                # GP prior centers on the trend: solve for the GP part
                uu = uu - self._H64.astype(uu.dtype) \
                    @ params["beta"].astype(uu.dtype).reshape(-1, 1)
            alpha = F.solve(uu)
        preds = (Kmn.astype(alpha.dtype) @ alpha).reshape(-1)
        if self.n_beta:
            trend = self._H_test64.astype(preds.dtype) \
                @ params["beta"].astype(preds.dtype).reshape(-1)
            preds = preds + trend
        return preds

    def _eval_err(self, params):
        preds = self._predict(params)
        diff = preds - self.u_test.reshape(-1)
        return jnp.linalg.norm(diff) / jnp.linalg.norm(self.u_test)

    def _criterion(self, params):
        """Early-stop criterion boundary_gap/N_b + eq_gap/N_col
        (reference: code/model_GP_solver_1d.py:182-191)."""
        _, _, _, boundary_gap, eq_gap = self.gaps(params)
        return boundary_gap / self.N_b + eq_gap / self.N_col

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def init_params(self, seed: int = 0):
        """Reference init (code/model_GP_solver_1d.py:203-213); the latent
        u initializer is selectable via config['init_u'] (zeros default,
        matching every shipped reference config)."""
        from gphm_tpu.problems.init_u import get_init_u
        d = self.policy.dtype
        # profiled mode: the "u" leaf carries the whitened optimum ut; the
        # loss and predictor consume it through K @ ut, so an f32 round-trip
        # would inject O(eps_f32 * ||K|| ||ut||) into the lifts — ut stays
        # at the wide tier
        ud = jnp.float64 if (self.u_mode == "profiled"
                             and self.wide_train) else d
        u0 = get_init_u(self.config.get("init_u", "zeros"))(
            self.N_col, self.bc_vals, key=jax.random.PRNGKey(seed), dtype=ud)
        freqs = None
        if self.config.get("freq_init", "linspace") == "spectral":
            # periodogram-of-source frequency placement (ops/kernels.py
            # spectral_freqs); the reference always uses linspace
            from gphm_tpu.ops.kernels import spectral_freqs
            x = getattr(self.problem, "X_col64", None)
            src = getattr(self.problem, "src64", None)
            freqs = spectral_freqs(
                x if x is not None else np.asarray(self.X_col),
                src if src is not None else np.asarray(self.src),
                int(self.config["Q"]), float(self.config["freq_scale"]),
                priority_order=bool(getattr(self, "staged_q_start", 0)))
        params = {
            "log_tau": jnp.zeros((), d),
            "log_v": jnp.zeros((), d),
            "kernel_paras": init_mixture_params(
                int(self.config["Q"]), float(self.config["freq_scale"]), d,
                freqs=freqs),
            "u": u0,
        }
        if self.n_beta:
            # trend coefficients: profiled (closed form) in profiled mode,
            # an ordinary Adam leaf otherwise
            params["beta"] = jnp.zeros((self.n_beta, 1), ud)
        if getattr(self, "occam_ramp_epochs", 0) > 0 \
                or getattr(self, "staged_q_start", 0) > 0:
            # device-side step counter for the Occam tempering ramp and
            # the staged-Q activation gate (frozen in the optimizer,
            # advanced by make_step_fn; f32 counts integers exactly to
            # 2^24 — every shipped budget fits)
            params["_epoch"] = jnp.zeros((), jnp.float32)
        return params

    def param_log(self, params):
        kp = self._kp(params)
        return {"w_list": jnp.exp(kp["log-w"]), "freq_list": kp["freq"],
                "ls_list": jnp.exp(kp["log-ls"])}

    def train(self, nepoch: int, seed: int = 0, verbose: bool = True,
              on_eval=None, mode: str = "auto", on_checkpoint=None,
              nan_policy: str = "warn", init_state=None,
              start_epoch: int = 0, min_err0: float = 2.0,
              error_increase_count0: int = 0, mesh=None,
              stop_epoch=None, n_evals: int = 20) -> TrainResult:
        if start_epoch or init_state is not None or stop_epoch is not None \
                or n_evals != 20:
            mode = "chunked"  # resume keeps the absolute eval cadence
        if on_checkpoint is not None or nan_policy in ("raise", "rollback"):
            # fused mode writes no rolling checkpoints and has no NaN guard:
            # silently dropping either would betray the caller's intent
            mode = "chunked"
        if mesh is not None:
            # sharded training (SURVEY §2.4 TP): the latent vector is
            # committed to the mesh's model axis and every jitted stage
            # (chunk runner, eval, predict) compiles against that sharding
            mode = "chunked"
        # seed only affects random u initializers (config['init_u']); with
        # the default zeros init the algorithm is fully deterministic (the
        # reference's loss likewise ignores its RNG key,
        # code/model_GP_solver_1d.py:124-149)
        # 1D early stopping is disabled in the reference
        # (code/model_GP_solver_1d.py:272-276) so the whole run can execute
        # as one fused on-device program. Very long single device executions
        # (> ~1 min) can trip infrastructure timeouts, so auto mode caps the
        # fused program at 20k epochs and uses per-eval-chunk dispatch above
        # that (20 host round-trips per run — still negligible).
        if mode == "auto":
            mode = ("fused" if nepoch % 20 == 0 and 20 <= nepoch <= 20000
                    else "chunked")
        if mode == "fused":
            from gphm_tpu.models.base import fused_train
            return fused_train(solver=self, params=self.init_params(seed),
                               nepoch=nepoch, verbose=verbose,
                               on_eval=on_eval)
        params = init_state[0] if init_state else self.init_params(seed)
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
        return chunked_train(
            state=state, nepoch=nepoch,
            tol=float(self.config.get("tol", -1.0)),
            early_stop_mode="off",
            on_eval=on_eval, on_checkpoint=on_checkpoint,
            nan_policy=nan_policy, start_epoch=start_epoch,
            stop_epoch=stop_epoch,
            min_err0=min_err0, error_increase_count0=error_increase_count0,
            max_launch=200 if self.wide_train else 5000,
            n_evals=n_evals, verbose=verbose,
            final_state=str(self.config.get("final_params", "last")))
