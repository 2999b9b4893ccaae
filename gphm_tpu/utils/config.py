"""Typed run configuration.

Replaces the reference's mutable ``trick_paras`` dict + fire CLI + attr-bag
``ExpConfig`` (reference: code/infras/exp_config.py:1-55, and the per-file
``evals`` functions, e.g. code/model_GP_solver_1d.py:396-447) with a frozen
dataclass resolved from the same per-equation YAML schema
(reference: code/config/*.yaml). Kernel and equation are plain registry
strings — no Python-object injection.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Optional

import yaml

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")

#: equations each solver family accepts (reference whitelists:
#: code/model_GP_solver_1d.py:403-411, _2d.py:474, _advection.py assert)
EQUATIONS_1D = [
    "poisson_1d-mix_sin", "poisson_1d-single_sin", "poisson_1d-sin_cos",
    "poisson_1d-x_time_sinx", "poisson_1d-x2_add_sinx",
    "allencahn_1d-sin_cos", "allencahn_1d-single_sin",
]
EQUATIONS_2D = [
    "poisson_2d-sin_cos", "poisson_2d-sin_sin", "poisson_2d-sin_add_cos",
    "allencahn_2d-mix-sincos", "poisson_2d-x2y2_add_sinsin",
]
EQUATIONS_ADVECTION = ["advection-sin"]


@dataclasses.dataclass(frozen=True)
class RunConfig:
    equation: str
    kernel: str = "Matern52_Cos_1d"
    kernel_extra: Optional[str] = None   # set -> two-GP solver (1D only)
    Q: int = 30
    lr: float = 0.01
    lr_decay: float = 1.0         # cosine-decay the lr to lr*lr_decay over
                                  # the epoch budget (1.0 = constant, the
                                  # reference protocol); stabilizes the
                                  # profiled marginal objective's tail
    llk_weight: float = 200.0
    freq_scale: float = 20.0
    logdet: bool = True
    num_fold: int = 1
    tol: float = -1.0
    N_col: int = 400
    scale: float = 1.0
    nepoch: int = 100000
    change_point: float = 0.5
    beta: float = 0.0
    jitter: float = 1e-6
    other_paras: str = ""
    # TPU-native extensions (not in the reference schema)
    dtype: str = "float64"        # "float32" / "mixed" / "refined" on TPU
    solve: str = "cholesky"       # or "cg" for the large-grid path
    jitter_retries: int = 3       # Cholesky jitter-escalation probe depth
    refine_iters: int = 8         # PCG iterations (dtype == "refined"):
                                  # ~15x error contraction per iteration,
                                  # 8 reaches the f64 floor at cond ~ 1e7
    refine_logdet_iters: int = 4  # PCG iterations for the logdet gradient
                                  # (the only matrix-RHS PCG in a refined
                                  # step): 4 -> ~5e-5 kernel-gradient error
                                  # vs f64 at ~25% less step cost; 0 = f32
                                  # factor gradient (~1e-2, fastest)
    n_evals: int = 20             # eval-cadence points per budget (the
                                  # reference hard-codes 20); denser
                                  # cadences record the two-GP post-switch
                                  # dip and let the error-increase early
                                  # stop fire near it
    nan_policy: str = "rollback"  # "rollback": on a non-finite eval,
                                  # restore the last finite (params,
                                  # opt_state ) snapshot with freshly
                                  # initialized optimizer moments and keep
                                  # going (<= 3 times, then stop early);
                                  # "warn" reproduces the reference's
                                  # train-blindly-through-NaN behaviour,
                                  # "raise" aborts. Checkpoints never
                                  # record a non-finite state under any
                                  # policy.
    freq_init: str = "linspace"   # "spectral": place mixture frequencies
                                  # on the source-term periodogram peaks
                                  # (ops/kernels.spectral_freqs) instead of
                                  # the reference's uniform linspace
    u_mode: str = "adam"          # "profiled": for linear residuals, write
                                  # the closed-form conditional optimum
                                  # u*(theta) each step (1D: one SPD solve;
                                  # 2D: warm-started eigenbasis-
                                  # preconditioned CG, ops/kron_profile.py)
                                  # and descend only on the kernel/noise
                                  # hyperparameters (envelope gradient) —
                                  # reaches the reference's 1e5-epoch error
                                  # floor in ~1e3 steps on poisson_1d
    profile_clip: float = 20.0    # profiled mode: |log_tau|,|log_v| box
                                  # (projected ascent; keeps the profiled
                                  # system f64-solvable — the degenerate
                                  # MAP ridge tau->inf is cut off at a
                                  # point where the stationary gaps ~1e-8
                                  # no longer bind accuracy)
    profile_cg_iters: int = 60    # 2D profiled mode: fixed PCG iterations
                                  # for the U*(theta) normal solve
    profile_newton_iters: int = 3  # profiled Allen-Cahn: damped Gauss-
                                  # Newton iterations per step (warm-started
                                  # from the previous optimum)
    profile_objective: str = "marginal"  # "marginal": add the Gaussian-
                                  # integral Occam term 0.5 logdet S -
                                  # logdet K, making the profiled objective
                                  # the exact negative log marginal
                                  # likelihood (proper in every
                                  # hyperparameter; ops/profile1d.py).
                                  # "map": the reference's joint-MAP form,
                                  # improper in the kernel hyperparameters
                                  # once the latent is profiled
    occam_weight: float = 1.0     # evidence tempering: static weight on
                                  # the marginal objective's Occam
                                  # correction (0.5 logdet S - logdet K).
                                  # 0 = improper MAP-like objective with
                                  # the marginal's boundary normalizer
                                  # (fast early descent), 1 = the exact
                                  # marginal (proper, bounded)
    occam_ramp: float = 0.0       # continuous evidence-tempering RAMP from
                                  # ep0 (round-4 VERDICT #4): the Occam
                                  # correction's weight grows linearly
                                  # 0 -> occam_weight over this fraction of
                                  # the epoch budget, read per step from a
                                  # device-side counter — no MAP-gradient
                                  # segment exists for the impropriety
                                  # cliff to fire in, unlike the piecewise
                                  # occam_schedule (campaign Z's measured
                                  # double negative). 0 = off.
    occam_schedule: str = ""      # piecewise evidence tempering over the
                                  # budget, e.g. "0:0.4,1:0.6" = weight 0
                                  # for the first 40% of epochs then the
                                  # full Occam term — MAP speed early,
                                  # properness in place before the MAP
                                  # impropriety cliff fires (the mix_sin
                                  # rollback dependence, PARITY campaign Z)
    occam_2d: str = "separable"   # 2D marginal objective's Occam term:
                                  # "separable" = the eigenbasis surrogate
                                  # (ops/kron_profile.occam_logdet_2d),
                                  # "slq" = surrogate + stochastic Lanczos
                                  # estimate of the dropped remainder (the
                                  # production-scale bias correction;
                                  # probe/iter counts via slq_probes /
                                  # slq_iters), "exact" = dense 0.5 logdet
                                  # S via Cholesky — O((N1 N2)^3), small
                                  # grids only; the ground truth the other
                                  # two are validated against
                                  # (tools/probe_occam2d.py)
    staged_q: str = ""            # staged mixture growth "k0:frac"
                                  # (round-4 VERDICT #4, lever 2): start
                                  # with the k0 strongest components
                                  # active and switch the rest on at
                                  # evenly spaced epochs over the first
                                  # `frac` of the budget. Components are
                                  # gated by weight (inactive ~ 1e-26, so
                                  # Adam leaves them at their spectral-
                                  # init placement until activation);
                                  # pairs with freq_init='spectral',
                                  # which then orders components
                                  # strongest-line-first. "" = off.
    mean_poly: int = -1           # polynomial trend degree (universal
                                  # kriging, ops/meanfn.py): u = H beta +
                                  # GP with beta profiled/trained jointly.
                                  # The principled fix for multi-scale
                                  # sources whose smooth component sits
                                  # below the residual noise floor
                                  # (x2_add_sinx's parabola). -1 = off
                                  # (the reference has no mean functions).
    multi_start: int = 1          # >1: warm up this many mixture-frequency
                                  # initializations concurrently (vmapped /
                                  # data-axis-sharded) and continue the
                                  # budget from the best by the training
                                  # criterion — the optimization-side fix
                                  # for the oscillatory-in-frequency MAP
                                  # objective on hard high-freq configs
    multi_start_frac: float = 0.01
                                  # fraction of the budget spent warming up
                                  # the starts (two-GP runs: must end at or
                                  # before the change point)
    multi_start_batch: int = 0    # >0: train the starts in sequential
                                  # groups of this size instead of one
                                  # vmapped batch — needed when K x the
                                  # per-start working set exceeds HBM
                                  # (N_col=900 Q=30 wants ~3.5 GB/start on
                                  # the 15.75 GB v5e). 0 = all at once.
    phase_exact: str = "auto"     # two-float compensated trig phase for the
                                  # f32 training-tier Grams (ops/df32.py):
                                  # "on" / "off" / "auto". Auto resolves to
                                  # OFF for plain-f32 training: the measured
                                  # f32 solve floor (cond(K) ~ 1/jitter)
                                  # dominates the ~|2 pi f tau| * eps(f32)
                                  # phase error on every shipped config, and
                                  # the accuracy tiers (refined/mixed/f64)
                                  # build wide f64 Grams where the phase is
                                  # exact anyway — so the ~17% step cost
                                  # (round-2 bench regression) buys nothing
                                  # (tools/profile_numerics.py, round 3)
    final_params: str = "last"    # "best": the run's final state is the
                                  # argmin-eval snapshot instead of the
                                  # budget-end params — walk-away
                                  # containment for profiled single-GP
                                  # marginal tails that drift off their own
                                  # min after the last improvement
                                  # (x_time_sinx, PARITY campaign X).
                                  # "last" = reference semantics.
    mesh: str = ""                # "DPxTP" device mesh ('1x8', '2x4'):
                                  # latent grid sharded on the model axis,
                                  # data axis for concurrent sweeps
    dtype_schedule: str = ""      # progressive precision, e.g.
                                  # "float32:0.9,refined:0.1": bulk of the
                                  # budget at f32 speed, refined tail
                                  # descends below the f32 error floor

    @property
    def family(self) -> str:
        if self.equation in EQUATIONS_ADVECTION:
            return "advection"
        if self.equation in EQUATIONS_2D:
            return "2d"
        if self.equation in EQUATIONS_1D:
            return "1d_extra" if self.kernel_extra else "1d"
        raise KeyError(f"unknown equation {self.equation!r}")

    def solver_dict(self) -> dict:
        """The subset the solver classes consume."""
        return {
            "Q": self.Q, "lr": self.lr, "lr_decay": self.lr_decay,
            "lr_decay_steps": self.nepoch if self.lr_decay < 1.0 else None,
            "llk_weight": self.llk_weight,
            "freq_scale": self.freq_scale, "logdet": self.logdet,
            "tol": self.tol, "jitter": self.jitter,
            "change_point": self.change_point, "solve": self.solve,
            "freq_init": self.freq_init, "u_mode": self.u_mode,
            "phase_exact": self.phase_exact,
            "mean_poly": self.mean_poly,
            "profile_clip": self.profile_clip,
            "profile_cg_iters": self.profile_cg_iters,
            "profile_newton_iters": self.profile_newton_iters,
            "profile_objective": self.profile_objective,
            "occam_2d": self.occam_2d,
            "occam_weight": self.occam_weight,
            "occam_ramp_epochs": (int(self.occam_ramp * self.nepoch)
                                  if self.occam_ramp > 0 else 0),
            "staged_q_start": (int(self.staged_q.split(":")[0])
                               if self.staged_q else 0),
            "staged_q_epochs": (int(float(self.staged_q.split(":")[1])
                                    * self.nepoch)
                                if self.staged_q else 0),
            "final_params": self.final_params,
        }


#: Field resets applied by ``reference_protocol=True`` (the CLI's
#: --reference-protocol): every TPU-native extension returns to the
#: reference's protocol semantics, so the run is the faithful reference
#: algorithm (Adam on the joint MAP, linspace frequency init, no trend, no
#: decay, blind-through-NaN) at the TPU production precision tier. The
#: shipped YAML values themselves encode the campaign-proven *headline*
#: protocols instead (PARITY.md "shipped default" column); per-config
#: reference values that the shipped defaults changed (epoch budgets,
#: jitter) live in each YAML's ``reference_overrides`` block and are
#: re-applied on top of this reset.
REFERENCE_RESET = dict(
    u_mode="adam", freq_init="linspace", mean_poly=-1, lr_decay=1.0,
    multi_start=1, dtype_schedule="", n_evals=20, phase_exact="auto",
    occam_weight=1.0, occam_schedule="", occam_ramp=0.0, staged_q="",
    final_params="last",
    nan_policy="warn", dtype="float32", profile_objective="marginal",
)


def _resolve_scale(raw) -> float:
    """YAML scale '2pi' -> 2*pi, else numeric
    (reference: code/model_GP_solver_1d.py:422-425)."""
    if isinstance(raw, str):
        return 2.0 * math.pi if raw == "2pi" else float(raw)
    return float(raw)


def load_config(equation: str, **overrides) -> RunConfig:
    """Load configs/<equation>.yaml and apply CLI-style overrides.

    ``reference_protocol=True`` strips the shipped (headline) protocol back
    to the faithful reference protocol: the ``REFERENCE_RESET`` field reset,
    then the YAML's ``reference_overrides`` block (per-config reference
    values — epoch budgets, jitter — that the shipped defaults changed).
    Explicit keyword overrides apply last in both modes.
    """
    path = overrides.pop("config_path", None) \
        or os.path.join(CONFIG_DIR, f"{equation}.yaml")
    reference_protocol = bool(overrides.pop("reference_protocol", False))
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    raw.pop("num_u_trick", None)       # always 1 in the reference; dead
    ref_over = raw.pop("reference_overrides", None) or {}
    if reference_protocol:
        raw.update(REFERENCE_RESET)
        raw.update(ref_over)
    raw["scale"] = _resolve_scale(raw.get("scale", 1.0))
    raw["equation"] = equation
    raw.update({k: v for k, v in overrides.items() if v is not None})
    fields = {f.name for f in dataclasses.fields(RunConfig)}
    unknown = set(raw) - fields
    if unknown:
        raise KeyError(f"unknown config keys: {sorted(unknown)}")
    cfg = RunConfig(**raw)
    if cfg.occam_ramp > 0 and cfg.occam_schedule:
        raise ValueError(
            "occam_ramp and occam_schedule are alternative tempering "
            "mechanisms — set at most one (the ramp is continuous from "
            "ep0; the schedule is piecewise across budget segments)")
    return cfg
