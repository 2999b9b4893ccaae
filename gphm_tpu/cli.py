"""Command-line interface.

Mirrors the reference launch surface (reference: code/run_1d.sh, run_2d.sh,
and the per-file fire CLIs, e.g. code/model_GP_solver_1d.py:396-451) with a
single entry point:

    python -m gphm_tpu.cli --equation poisson_1d-single_sin \
        --kernel Matern52_Cos_1d --nepoch 100000

Extra-GP runs (the reference's model_GP_solver_1d_extra.py) are selected with
``--extra`` (kernel_extra defaults to Matern52_1d as in the reference,
code/model_GP_solver_1d_extra.py:467).
"""

from __future__ import annotations

import argparse
import os
import sys

from gphm_tpu.utils.config import (EQUATIONS_1D, EQUATIONS_2D,
                                   EQUATIONS_ADVECTION, load_config)

ALL_EQUATIONS = EQUATIONS_1D + EQUATIONS_2D + EQUATIONS_ADVECTION
KERNELS = ["Matern52_Cos_1d", "SE_Cos_1d", "Matern52_1d", "SE_1d"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gphm_tpu",
        description="TPU-native GP solver for high-frequency PDEs (GP-HM)")
    p.add_argument("--equation", required=True, choices=ALL_EQUATIONS)
    p.add_argument("--kernel", default="Matern52_Cos_1d", choices=KERNELS)
    p.add_argument("--nepoch", type=int, default=None)
    p.add_argument("--extra", action="store_true",
                   help="two-GP residual trick (1D only)")
    p.add_argument("--kernel-extra", default="Matern52_1d", choices=KERNELS)
    p.add_argument("--change-point", type=float, default=None,
                   dest="change_point",
                   help="two-GP phase-switch fraction (extra runs only)")
    p.add_argument("--jitter", type=float, default=None,
                   help="base diagonal jitter (reference default 1e-6; "
                        "raise to 1e-5 for f32 stability on stiff configs)")
    p.add_argument("--N-col", type=int, default=None, dest="N_col")
    p.add_argument("--Q", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lr-decay", type=float, default=None, dest="lr_decay",
                   help="cosine-decay the lr to lr*LR_DECAY over the epoch "
                        "budget (default 1.0 = constant, the reference "
                        "protocol); stabilizes the profiled marginal "
                        "objective's oscillatory tail")
    p.add_argument("--dtype", default=None,
                   choices=["float32", "float64", "mixed", "refined"],
                   help="float32 = TPU production; float64 = validation; "
                        "mixed = f32 Gram + f64 factorization/solves; "
                        "refined = f64 Grams + f32 factorization + "
                        "f64-residual refinement (f64 accuracy at ~f32 "
                        "cost — for the hard high-frequency configs)")
    p.add_argument("--dtype-schedule", default=None, dest="dtype_schedule",
                   help="progressive precision schedule, e.g. "
                        "'float32:0.9,refined:0.1' — train most of the "
                        "budget at f32 speed, then descend below the f32 "
                        "error floor with a refined-precision tail")
    p.add_argument("--refine-logdet-iters", type=int, default=None,
                   dest="refine_logdet_iters",
                   help="refined tier: PCG iterations for the logdet "
                        "gradient (4 = ~5e-5 kernel-grad error, 0 = f32 "
                        "gradient, fastest)")
    p.add_argument("--mean-poly", type=int, default=None, dest="mean_poly",
                   help="polynomial trend degree (universal kriging): "
                        "u = H beta + GP, beta fitted jointly with the "
                        "latent (closed form in profiled mode). Fits "
                        "smooth solution components exactly with no "
                        "residual-noise-floor coupling (x2_add_sinx's "
                        "parabola). Default off")
    p.add_argument("--freq-init", default=None, dest="freq_init",
                   choices=["linspace", "spectral"],
                   help="mixture frequency init: 'linspace' (reference) or "
                        "'spectral' — place components on the source-term "
                        "periodogram peaks (the known source reveals the "
                        "solution's spectral lines exactly; cracks the "
                        "hard high-frequency configs)")
    p.add_argument("--n-evals", type=int, default=None, dest="n_evals",
                   help="evaluations per budget (reference cadence: 20); "
                        "denser cadences record the two-GP post-switch dip "
                        "and fire the error-increase stop near it")
    p.add_argument("--u-mode", default=None, dest="u_mode",
                   choices=["adam", "profiled"],
                   help="latent update: 'adam' (reference protocol) or "
                        "'profiled' — write the conditional optimum of the "
                        "latent each step (linear residuals: one whitened "
                        "SPD solve; Allen-Cahn: damped Gauss-Newton) and "
                        "descend only on the hyperparameters (~100x fewer "
                        "epochs to the same error)")
    p.add_argument("--profile-cg-iters", type=int, default=None,
                   dest="profile_cg_iters",
                   help="2D profiled mode: fixed PCG iterations for the "
                        "U*(theta) normal solve (default 60)")
    p.add_argument("--profile-objective", default=None,
                   dest="profile_objective", choices=["marginal", "map"],
                   help="profiled mode objective: 'marginal' (default — "
                        "exact negative log marginal likelihood via the "
                        "Occam term, proper in every hyperparameter) or "
                        "'map' (the reference's joint-MAP form)")
    p.add_argument("--occam-weight", type=float, default=None,
                   dest="occam_weight",
                   help="evidence tempering: static weight on the marginal "
                        "objective's Occam correction (0 = improper "
                        "MAP-like with the marginal boundary normalizer, "
                        "1 = exact marginal; default 1)")
    p.add_argument("--occam-ramp", type=float, default=None,
                   dest="occam_ramp",
                   help="continuous evidence-tempering ramp: Occam weight "
                        "grows 0 -> occam_weight over this fraction of the "
                        "budget from ep0 (no discontinuity for the MAP "
                        "impropriety cliff to fire at; cf. --occam-schedule)")
    p.add_argument("--occam-schedule", default=None, dest="occam_schedule",
                   help="piecewise evidence tempering over the budget, "
                        "'weight:frac,...' e.g. '0:0.4,1:0.6' — MAP speed "
                        "early, the proper marginal in place before the "
                        "impropriety cliff (composes with --dtype-schedule "
                        "on merged segment boundaries)")
    p.add_argument("--occam-2d", default=None, dest="occam_2d",
                   choices=["separable", "slq", "exact"],
                   help="2D marginal Occam term: 'separable' (default — "
                        "the eigenbasis surrogate), 'slq' (surrogate + "
                        "stochastic Lanczos estimate of the dropped "
                        "remainder — the production-scale correction for "
                        "the surrogate's measured bias at sharp "
                        "hyperparameters) or 'exact' (dense 0.5 logdet S, "
                        "small grids only — the ground truth)")
    p.add_argument("--profile-newton-iters", type=int, default=None,
                   dest="profile_newton_iters",
                   help="profiled Allen-Cahn: damped Gauss-Newton "
                        "iterations per step (default 3)")
    p.add_argument("--staged-q", default=None, dest="staged_q",
                   help="staged mixture growth 'k0:frac': k0 strongest "
                        "components active from ep0, the rest switch on "
                        "over the first frac of the budget (pairs with "
                        "--freq-init spectral)")
    p.add_argument("--final-params", default=None, dest="final_params",
                   choices=["last", "best"],
                   help="'best': end the run at the argmin-eval snapshot "
                        "instead of the budget-end params (walk-away "
                        "containment for profiled marginal tails; "
                        "'last' = reference semantics)")
    p.add_argument("--nan-policy", default=None, dest="nan_policy",
                   choices=["rollback", "warn", "raise"],
                   help="non-finite-state handling at an eval point: "
                        "'rollback' (default — restore the last finite "
                        "snapshot with fresh optimizer moments, up to 3 "
                        "times, then stop), 'warn' (the reference trains "
                        "blindly through NaN), 'raise' (abort)")
    p.add_argument("--multi-start", type=int, default=None,
                   dest="multi_start",
                   help="warm up this many mixture-frequency "
                        "initializations concurrently (vmapped; data-axis-"
                        "sharded on a mesh) and continue the budget from "
                        "the best by the training criterion. Exploratory "
                        "only — measured NOT to beat the shipped "
                        "single-start defaults (PARITY campaign V: "
                        "x_time_sinx 8-start 1.47e-2 vs 1.98e-3 default; "
                        "the 1D failure mode is shared by every start, so "
                        "warmup selection cannot fix it)")
    p.add_argument("--multi-start-frac", type=float, default=None,
                   dest="multi_start_frac",
                   help="fraction of the budget spent on the multi-start "
                        "warmup (default 0.01; two-GP runs need it at or "
                        "before the change point)")
    p.add_argument("--multi-start-batch", type=int, default=None,
                   dest="multi_start_batch",
                   help="train the starts in sequential groups of this "
                        "size (default: all at once) — use when K x the "
                        "per-start working set exceeds device memory, e.g. "
                        "8 starts at N_col=900 want ~28 GB on a 16 GB v5e")
    p.add_argument("--reference-protocol", action="store_true",
                   dest="reference_protocol",
                   help="run the faithful reference protocol (Adam on the "
                        "joint MAP, linspace frequency init, no trend/decay"
                        "/multi-start, reference epoch budgets and jitter) "
                        "at the TPU float32 production tier, instead of the "
                        "shipped campaign-proven headline protocol encoded "
                        "in the YAML (add --dtype float64 on CPU for "
                        "bit-level reference validation)")
    p.add_argument("--num-fold", type=int, default=None, dest="num_fold")
    p.add_argument("--mesh", default=None,
                   help="device mesh 'DPxTP' (e.g. 1x8, 2x4): training, "
                        "eval and predict run SPMD-sharded — the latent "
                        "grid on the model axis; the data axis runs "
                        "--sweep variants concurrently")
    p.add_argument("--sweep", default=None, dest="sweep",
                   help="comma-separated freq_scale variants trained "
                        "concurrently (data-parallel over the mesh's data "
                        "axis), e.g. --sweep 10,20,40,80")
    p.add_argument("--out", default="result_log",
                   help="artifact directory (use '' to disable)")
    p.add_argument("--no-figures", action="store_true")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the JAX backend (this environment "
                        "pre-registers the TPU plugin, so JAX_PLATFORMS in "
                        "the shell is too late; this flag applies "
                        "jax.config before any array op)")
    p.add_argument("--resume", action="store_true",
                   help="continue fold 0 from the run's rolling checkpoint")
    p.add_argument("--stop-epoch", type=int, default=None, dest="stop_epoch",
                   help="pause the run after this absolute epoch (resume "
                        "later with --resume; the nepoch budget, eval "
                        "cadence and artifact naming stay those of the "
                        "full run) — bounded-duration segments, also the "
                        "process-per-segment way to run a precision "
                        "schedule: e.g. float32 with --stop-epoch 900000, "
                        "then --dtype refined --resume")
    p.add_argument("--quiet", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    try:
        # persistent XLA compile cache (repo-local, git-ignored): schedule
        # runs compile several scan programs per segment, and campaign-style
        # batches of CLI invocations would otherwise recompile each time
        import jax
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    overrides = dict(nepoch=args.nepoch, N_col=args.N_col, Q=args.Q,
                     lr=args.lr, lr_decay=args.lr_decay,
                     dtype=args.dtype, num_fold=args.num_fold,
                     kernel=args.kernel, change_point=args.change_point,
                     jitter=args.jitter, mesh=args.mesh,
                     dtype_schedule=args.dtype_schedule,
                     refine_logdet_iters=args.refine_logdet_iters,
                     freq_init=args.freq_init, n_evals=args.n_evals,
                     mean_poly=args.mean_poly,
                     multi_start=args.multi_start,
                     multi_start_frac=args.multi_start_frac,
                     multi_start_batch=args.multi_start_batch,
                     u_mode=args.u_mode, nan_policy=args.nan_policy,
                     profile_cg_iters=args.profile_cg_iters,
                     profile_objective=args.profile_objective,
                     profile_newton_iters=args.profile_newton_iters,
                     occam_2d=args.occam_2d,
                     occam_weight=args.occam_weight,
                     occam_schedule=args.occam_schedule,
                     occam_ramp=args.occam_ramp,
                     staged_q=args.staged_q,
                     final_params=args.final_params)
    if args.reference_protocol:
        overrides["reference_protocol"] = True
    if args.extra:
        if args.equation not in EQUATIONS_1D:
            print("--extra is only supported for 1D equations",
                  file=sys.stderr)
            return 2
        overrides["kernel_extra"] = args.kernel_extra
    config = load_config(args.equation, **overrides)

    if args.sweep:
        from gphm_tpu.experiment import run_sweep_experiment
        freq_scales = [float(s) for s in args.sweep.split(",")]
        errs = run_sweep_experiment(config, freq_scales,
                                    verbose=not args.quiet)
        for fs, e in zip(freq_scales, errs):
            print(f"freq_scale {fs:g}: rel-L2 {e:.6g}")
        return 0

    from gphm_tpu.experiment import run_experiment
    res = run_experiment(config, out_base=args.out or None,
                         verbose=not args.quiet,
                         figures=not args.no_figures,
                         resume=args.resume, stop_epoch=args.stop_epoch)
    print(f"err mean {res.err_mean:.6g} +- {res.err_std:.3g}  "
          f"time {res.used_time:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
