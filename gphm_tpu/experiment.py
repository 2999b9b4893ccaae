"""Experiment driver: fold loop, timing, persistence, figures.

Single implementation of what the reference duplicates four times as
``test(trick_paras)`` (reference: code/model_GP_solver_1d.py:310-391,
_2d.py:382-464, _advection.py:381-460, _1d_extra.py:354-441): build the
problem, run ``num_fold`` training folds, aggregate error mean/std and
wall-time, checkpoint fold 0, and append the text log.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gphm_tpu.models.extra import Solver1DExtra
from gphm_tpu.models.solver_1d import Solver1D
from gphm_tpu.models.solver_2d import Solver2D
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem
from gphm_tpu.utils.checkpoint import run_dir, save_checkpoint
from gphm_tpu.utils.config import RunConfig
from gphm_tpu.utils.logging import MetricsLogger, append_text_log


def _final_store_params(config: RunConfig, directory: str, res):
    """The params stored as the run's final state (params_fold0).

    ``final_params='best'``: prefer the on-disk argmin checkpoint when it
    beats the in-memory result — a wall-capped leg's in-memory argmin
    dies with its process, and a resumed continuation may never improve
    on it (measured round 5: the x_time_sinx resume leg ended 3.5x off
    the whole-run min until this path existed). Only applies when the
    stored best and the final params share a tree (same phase for the
    two-GP family)."""
    if config.final_params != "best":
        return res.params
    best_path = os.path.join(directory, "params_best_fold0.npz")
    if not os.path.exists(best_path):
        return res.params
    from gphm_tpu.utils.checkpoint import load_checkpoint, load_meta
    try:
        meta = load_meta(best_path)["meta"]
        if float(meta.get("min_err", "inf")) <= float(res.min_err) + 1e-300:
            return load_checkpoint(best_path, res.params)
    except Exception as e:
        print(f"WARNING: final_params=best could not load {best_path}: {e}")
    return res.params


def _policy_for(config: RunConfig) -> Policy:
    if not jax.config.jax_enable_x64:
        # x64 must be live for every run: float64 configs would otherwise
        # silently downcast to f32, and f32 runs use f64 for the
        # prediction-time solves (see Solver1D.__init__). Training arrays
        # keep the policy dtype via explicit casts throughout.
        try:
            jax.config.update("jax_enable_x64", True)
        except Exception as e:  # backend already used with x32 literals
            print(f"warning: could not enable x64 ({e}); f32 runs will "
                  f"evaluate predictions in f32")
    if config.dtype == "refined":
        # f64 hot-loop Grams + fast f32 factorization + f64-residual
        # refinement sweeps (ops/refined.py): ~f64 forward error at ~f32
        # cost — the production tier for the reference's hard f64-dependent
        # configs (reference: code/run_1d.sh:39-40)
        return Policy(dtype=jnp.float32, refine_iters=config.refine_iters,
                      refine_logdet_iters=config.refine_logdet_iters,
                      jitter=config.jitter,
                      max_jitter_tries=config.jitter_retries)
    if config.dtype == "mixed":
        # f32 Gram/optimizer + f64 factorization/solves: targets configs
        # where cond(K) approaches 1/eps_f32 during training
        return Policy(dtype=jnp.float32, solve_dtype=jnp.float64,
                      jitter=config.jitter,
                      max_jitter_tries=config.jitter_retries)
    return Policy(dtype=jnp.dtype(config.dtype), jitter=config.jitter,
                  max_jitter_tries=config.jitter_retries)


def make_solver(config: RunConfig, policy: Optional[Policy] = None):
    """Problem + solver for any of the 12 equations."""
    policy = policy or _policy_for(config)
    prob = make_problem(config.equation, N_col=config.N_col,
                        scale=config.scale, beta=config.beta,
                        dtype=policy.dtype)
    sd = config.solver_dict()
    fam = config.family
    if fam == "1d":
        return Solver1D(prob, config.kernel, sd, policy)
    if fam == "1d_extra":
        return Solver1DExtra(prob, config.kernel, sd, policy,
                             kernel_extra=config.kernel_extra)
    if fam in ("2d", "advection"):
        # mean_poly rides the adam path in 2D (separable tensor-product
        # trend, Solver2D); the 2D profiled engine rejects it itself
        return Solver2D(prob, config.kernel, sd, policy)
    raise KeyError(fam)


def parse_schedule(spec: str, nepoch: int):
    """'float32:0.9,refined:0.1' -> [('float32', 900000), ('refined', 1000000)]
    (dtype, cumulative stop epoch). Fractions must sum to 1."""
    segs = []
    total = 0.0
    for part in spec.split(","):
        dtype, frac = part.split(":")
        total += float(frac)
        segs.append((dtype.strip(), int(round(total * nepoch))))
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"schedule fractions must sum to 1, got {total}")
    segs[-1] = (segs[-1][0], nepoch)  # absorb rounding
    return segs


def merged_schedule(config: RunConfig, nepoch: int):
    """Merge ``dtype_schedule`` and ``occam_schedule`` into consecutive
    (dtype, occam_weight, stop_epoch) segments on the union of both
    boundary sets.  Either schedule may be empty (the config's static
    value applies throughout)."""
    dsegs = (parse_schedule(config.dtype_schedule, nepoch)
             if config.dtype_schedule else [(config.dtype, nepoch)])
    osegs = ([(float(w), s) for w, s
              in parse_schedule(config.occam_schedule, nepoch)]
             if config.occam_schedule
             else [(float(config.occam_weight), nepoch)])
    out, di, oi, start = [], 0, 0, 0
    while di < len(dsegs) and oi < len(osegs):
        stop = min(dsegs[di][1], osegs[oi][1])
        if stop > start:
            out.append((dsegs[di][0], osegs[oi][0], stop))
            start = stop
        if dsegs[di][1] == stop:
            di += 1
        if osegs[oi][1] == stop:
            oi += 1
    return out


def _train_scheduled(config: RunConfig, nepoch: int, mesh, *,
                     verbose, on_eval, on_checkpoint, extra_kw, resume_kw,
                     seed: int = 0, stop_epoch=None):
    """Scheduled training: run the single nepoch-budget protocol as
    consecutive (dtype, occam_weight) segments with in-memory state handoff.

    Two independent piecewise knobs share the machinery:

    * ``dtype_schedule`` — progressive precision, the TPU-native answer to
      "the hard configs need f64": train the bulk of the budget in fast
      float32 (the f32 error floor is reached long before the budget runs
      out) and descend below that floor with a refined-tier tail — full-
      refined quality at a fraction of full-refined cost (the refined step
      is ~14x the f32 step at N=400).
    * ``occam_schedule`` — evidence tempering for the profiled marginal
      objective: MAP-like speed early (weight 0 skips the Occam
      factorization entirely), the proper marginal in place before the
      MAP impropriety cliff fires (PARITY campaign Z).

    Eval cadence, min-error tracking, the two-GP phase switch, checkpoints,
    and resume all keep their absolute-epoch semantics across segment
    boundaries.
    """
    segments = merged_schedule(config, nepoch)
    start = int(resume_kw.get("start_epoch", 0))
    state = resume_kw.get("init_state")
    base_params = resume_kw.get("base_params")
    min_err = float(resume_kw.get("min_err0", 2.0))
    err_inc = int(resume_kw.get("error_increase_count0", 0))

    merged_log, wall, results = {}, 0.0, []
    last = None
    best_params, best_epoch = None, None
    for i, (dtype, occam_w, stop) in enumerate(segments):
        final_seg = i == len(segments) - 1
        if stop <= start and not (final_seg and last is None):
            # skip already-completed segments; the final segment still runs
            # (as a graceful no-op) when the whole budget is done, so a
            # --resume of a finished run reports the result instead of
            # crashing on last=None
            continue
        if stop_epoch is not None:
            if start >= stop_epoch:
                break
            stop = min(stop, int(stop_epoch))
        seg_cfg = dataclasses.replace(config, dtype=dtype, dtype_schedule="",
                                      occam_weight=occam_w,
                                      occam_schedule="")
        solver = make_solver(seg_cfg)
        if state is not None:
            d = solver.policy.dtype
            state = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, d) if jnp.issubdtype(
                    jnp.asarray(a).dtype, jnp.floating) else a, state)
        kw = dict(seed=seed, verbose=verbose, on_eval=on_eval,
                  on_checkpoint=on_checkpoint, mesh=mesh,
                  start_epoch=start, stop_epoch=stop,
                  min_err0=min_err, error_increase_count0=err_inc,
                  init_state=state, n_evals=config.n_evals,
                  nan_policy=config.nan_policy, **extra_kw)
        if config.family == "1d_extra":
            change = int(nepoch * config.change_point)
            if start > change:
                if base_params is None:
                    raise ValueError(
                        "schedule segment resumes inside phase 2 but no "
                        "base_params were handed off")
                kw["base_params"] = base_params
        else:
            kw.pop("on_phase_switch", None)
        if verbose:
            print(f"schedule segment dtype={dtype} occam={occam_w}: "
                  f"epochs [{start}, {stop})")
        res = solver.train(nepoch, **kw)
        results.append(res)
        last = res
        for k, v in res.log.items():
            merged_log.setdefault(k, []).extend(v)
        wall += res.wall_time
        min_err = min(min_err, res.min_err)
        err_inc = int(res.extras.get("error_increase_count", err_inc))
        if res.extras.get("best_params") is not None:
            # a segment only records best_params when it improved the
            # running (cross-segment) minimum it was seeded with
            best_params = res.extras["best_params"]
            best_epoch = res.extras.get("best_epoch")
        if res.extras.get("base_params") is not None:
            base_params = res.extras["base_params"]
        if res.early_stopping.get("flag"):
            break
        start = int(res.extras.get("last_epoch", stop))
        state = (res.params, res.opt_state)

    out = dataclasses.replace(
        last, log=merged_log, min_err=min_err, wall_time=wall)
    out.extras = dict(last.extras)
    out.extras["base_params"] = base_params
    out.extras["best_params"] = best_params
    out.extras["best_epoch"] = best_epoch
    out.extras["segments"] = [(d, w, s) for d, w, s in segments]
    return out


@dataclasses.dataclass
class ExperimentResult:
    config: RunConfig
    err_mean: float
    err_std: float
    err_list: list
    stop_epoch_mean: float
    used_time: float
    fold_results: list


def run_experiment(config: RunConfig, *, out_base: Optional[str] = "result_log",
                   verbose: bool = True, figures: bool = True,
                   nepoch: Optional[int] = None,
                   resume: bool = False,
                   stop_epoch: Optional[int] = None) -> ExperimentResult:
    nepoch = nepoch or config.nepoch
    if nepoch != config.nepoch:
        # keep the config self-consistent with the actual budget: solver
        # construction reads nepoch-derived values (the lr-decay cosine
        # span via solver_dict's lr_decay_steps)
        config = dataclasses.replace(config, nepoch=nepoch)
    solver_cfg = config
    scheduled = bool(config.dtype_schedule or config.occam_schedule)
    if scheduled:
        # the driver-level solver (resume templates, post-run prediction and
        # figures) evaluates at the schedule's final-segment tier
        fin_dtype, fin_ow, _ = merged_schedule(config, nepoch)[-1]
        solver_cfg = dataclasses.replace(
            config, dtype=fin_dtype, dtype_schedule="",
            occam_weight=fin_ow, occam_schedule="")
    solver = make_solver(solver_cfg)
    mesh = None
    if config.mesh:
        # SPMD product surface (SURVEY §2.4): '--mesh DPxTP' shards the
        # latent grid over the model axis; training, eval and predict all
        # compile against that sharding (GSPMD inserts the collectives)
        from gphm_tpu.parallel.mesh import mesh_from_spec
        mesh = mesh_from_spec(config.mesh)
        if verbose:
            print(f"mesh {config.mesh}: devices "
                  f"{[d.id for d in mesh.devices.flat]}")

    directory = run_dir(out_base, config.equation, config.kernel,
                        config.kernel_extra, nepoch, config.Q) \
        if out_base else None
    run_name = f"{config.equation}-{config.kernel}{config.other_paras}" \
               f"-Ncol-{config.N_col}"

    err_list, stop_epochs, fold_results = [], [], []
    start = time.time()
    for fold in range(config.num_fold):
        metrics = MetricsLogger(
            os.path.join(directory, f"metrics_fold{fold}.jsonl")
            if directory else None, append=resume)

        def on_eval(epoch, err, loss):
            metrics.log(fold=fold, epoch=epoch, rel_l2=err, loss=loss)

        on_checkpoint = None
        extra_kw = {}
        if directory and fold == 0:
            latest = os.path.join(directory, "latest.npz")
            base_latest = os.path.join(directory, "base_latest.npz")
            best_path = os.path.join(directory, "params_best_fold0.npz")
            # mid-run argmin persistence: seed from any prior leg's best
            # so a resumed run never REGRESSES the on-disk best (the
            # round-5 x_time_sinx lesson — a wall-capped leg's in-memory
            # argmin dies with the process, and the continuation leg may
            # never beat it, leaving final_params='best' nothing to
            # return)
            best_seen = [float("inf")]
            if resume and os.path.exists(best_path):
                try:
                    best_seen[0] = float(
                        load_meta(best_path)["meta"].get("min_err", "inf"))
                except Exception:
                    pass

            def on_checkpoint(epoch, params, opt_state, stats=None):
                # rolling checkpoint for crash resume (absent from the
                # reference, which pickles only once post-training); the
                # running min_err/counter ride along so a resumed run
                # reports the whole-run aggregate
                save_checkpoint(latest, (params, opt_state),
                                meta={"epoch": epoch, **(stats or {}),
                                      **dataclasses.asdict(config)})
                # argmin checkpoint at eval time: on_checkpoint fires at
                # every eval, and stats.min_err improves exactly when the
                # CURRENT params are the new argmin — persist them so the
                # best state survives wall caps and resumes
                mi = (stats or {}).get("min_err")
                if mi is not None and float(mi) < best_seen[0]:
                    best_seen[0] = float(mi)
                    save_checkpoint(
                        best_path, params,
                        meta={"epoch": epoch, "min_err": float(mi),
                              "phase2": config.family == "1d_extra"
                              and epoch >= int(config.nepoch
                                               * config.change_point),
                              # full config rides along: analysis.
                              # load_model rebuilds RunConfig from this
                              # meta (same contract as the fold-end save)
                              **dataclasses.asdict(config)})
                # ridge-flip observability (ADVICE r2): the augmented-trend
                # factorization's two-level ridge select is discontinuous
                # in objective value; log which level the current params
                # pick so marginal-loss jumps in the metrics stream can be
                # attributed to a ridge flip rather than the optimizer
                if hasattr(solver, "trend_ridge_level") \
                        and getattr(solver, "n_beta", 0):
                    try:
                        metrics.log(fold=fold, epoch=epoch,
                                    ridge_big=solver.trend_ridge_level(
                                        params))
                    except Exception:
                        pass

            if config.family == "1d_extra":
                # persist the frozen phase-1 GP the moment the two-GP
                # switch fires, enabling phase-2 crash resume
                def on_phase_switch(epoch, base_params):
                    save_checkpoint(base_latest, base_params,
                                    meta={"epoch": epoch})

                extra_kw["on_phase_switch"] = on_phase_switch

        # crash resume: pick up fold 0 from the rolling checkpoint
        # (reference has no resume at all; SURVEY §5)
        resume_kw = {}
        if resume and fold == 0 and directory:
            latest = os.path.join(directory, "latest.npz")
            if os.path.exists(latest):
                from gphm_tpu.utils.checkpoint import (load_checkpoint,
                                                       load_meta)
                meta = load_meta(latest)["meta"]
                epoch_done = int(meta["epoch"])
                start_ep = epoch_done + 1
                min_err0 = meta.get("min_err")
                if min_err0 is None:
                    # checkpoints written before min_err persistence (or by
                    # older code): recover the running minimum from the
                    # run's metrics log so the resumed run still reports
                    # the whole-run aggregate
                    mpath = os.path.join(directory,
                                         f"metrics_fold{fold}.jsonl")
                    min_err0 = 2.0
                    if os.path.exists(mpath):
                        import json
                        with open(mpath) as mf:
                            for line in mf:
                                try:
                                    rec = json.loads(line)
                                except ValueError:
                                    continue
                                if rec.get("epoch", 0) <= epoch_done and \
                                        "rel_l2" in rec:
                                    min_err0 = min(min_err0,
                                                   float(rec["rel_l2"]))
                resume_kw = dict(
                    start_epoch=start_ep,
                    min_err0=float(min_err0),
                    error_increase_count0=int(
                        meta.get("error_increase_count", 0)))
                phase2 = (config.family == "1d_extra"
                          and start_ep > int(nepoch * config.change_point))
                if phase2:
                    # checkpoints past the change point hold phase-2 (extra)
                    # parameters; the frozen base comes from base_latest.npz
                    base_latest = os.path.join(directory, "base_latest.npz")
                    if not os.path.exists(base_latest):
                        raise FileNotFoundError(
                            f"phase-2 resume needs {base_latest} (written "
                            f"at the phase switch); not found")
                    base_params = load_checkpoint(base_latest,
                                                  solver.init_params())
                    tmpl_p = solver.init_params_extra(base_params)
                    tmpl = (tmpl_p, solver.optimizer_extra.init(tmpl_p))
                    resume_kw["base_params"] = base_params
                else:
                    tmpl_p = solver.init_params()
                    tmpl = (tmpl_p, solver.optimizer.init(tmpl_p))
                resume_kw["init_state"] = load_checkpoint(latest, tmpl)
                # A checkpoint written by pre-guard code (or a torn write)
                # can hold a non-finite state; resuming from it would seed
                # training — and the rollback's last-good snapshot — with
                # NaNs. Reject it: restart from epoch 0 but keep the
                # recovered running minimum so the whole-run aggregate
                # stays honest.
                leaves = jax.tree_util.tree_leaves(resume_kw["init_state"]) \
                    + jax.tree_util.tree_leaves(
                        resume_kw.get("base_params", ()))
                if not all(np.all(np.isfinite(l)) for l in leaves
                           if hasattr(l, "dtype")
                           and np.issubdtype(np.asarray(l).dtype,
                                             np.floating)):
                    print(f"WARNING: rolling checkpoint {latest} holds a "
                          f"non-finite state (epoch {epoch_done}); "
                          f"discarding it and restarting from epoch 0")
                    resume_kw = dict(min_err0=float(min_err0)) \
                        if np.isfinite(float(min_err0)) else {}
                elif verbose:
                    print(f"resuming from epoch {start_ep}"
                          + (" (phase 2)" if phase2 else ""))

        if config.multi_start > 1 and not resume_kw:
            # frequency multi-start (DP over the mesh's data axis): warm up
            # K inits concurrently, continue the budget from the best by the
            # training criterion. Counts against the epoch budget — the
            # continuation resumes at start_epoch = warmup.
            warmup = int(round(nepoch * config.multi_start_frac))
            if config.family == "1d_extra":
                change = int(nepoch * config.change_point)
                if warmup > change:
                    raise ValueError(
                        f"multi-start warmup ({warmup} epochs) must end at "
                        f"or before the two-GP change point ({change}); "
                        f"lower multi_start_frac")
            if warmup > 0:
                from gphm_tpu.parallel.sweep import multi_start_train
                seg0 = (parse_schedule(config.dtype_schedule, nepoch)[0][0]
                        if config.dtype_schedule else config.dtype)
                ms_solver = make_solver(dataclasses.replace(
                    config, dtype=seg0, dtype_schedule=""))
                if verbose:
                    print(f"multi-start: {config.multi_start} starts x "
                          f"{warmup} warmup epochs ({seg0})")
                p0, s0, ms_info = multi_start_train(
                    ms_solver, warmup, config.multi_start, mesh=mesh,
                    batch=config.multi_start_batch or None,
                    verbose=verbose)
                resume_kw = dict(start_epoch=warmup, init_state=(p0, s0))
                metrics.log(fold=fold, multi_start=ms_info)

        if verbose:
            print(f"fold {fold}: {config.equation} / {config.kernel} "
                  f"({nepoch} epochs)")
        if scheduled:
            res = _train_scheduled(config, nepoch, mesh, verbose=verbose,
                                   on_eval=on_eval,
                                   on_checkpoint=on_checkpoint,
                                   extra_kw=extra_kw, resume_kw=resume_kw,
                                   seed=fold, stop_epoch=stop_epoch)
        else:
            res = solver.train(nepoch, seed=fold, verbose=verbose,
                               on_eval=on_eval, on_checkpoint=on_checkpoint,
                               mesh=mesh, stop_epoch=stop_epoch,
                               n_evals=config.n_evals,
                               nan_policy=config.nan_policy,
                               **extra_kw, **resume_kw)
        err_list.append(res.min_err)
        stop_epochs.append(res.early_stopping["epoch"])
        fold_results.append(res)

        if fold == 0 and directory:
            save_checkpoint(
                os.path.join(directory, "params_fold0.npz"),
                _final_store_params(config, directory, res),
                meta=dataclasses.asdict(config))
            save_checkpoint(
                os.path.join(directory, "opt_state_fold0.npz"),
                res.opt_state)
            if res.extras.get("base_params") is not None:
                # two-GP runs: keep the frozen phase-1 GP alongside the
                # phase-2 (extra) parameters for post-hoc prediction
                save_checkpoint(
                    os.path.join(directory, "base_params_fold0.npz"),
                    res.extras["base_params"])
            if res.extras.get("best_params") is not None:
                # the argmin-eval state: with sharp post-dip drift (two-GP
                # phase 2) the final params can be far worse than the
                # reported min rel-L2 — post-hoc prediction should come
                # from this checkpoint
                be = res.extras.get("best_epoch")
                phase2 = (config.family == "1d_extra" and be is not None
                          and be >= int(nepoch * config.change_point))
                save_checkpoint(
                    os.path.join(directory, "params_best_fold0.npz"),
                    res.extras["best_params"],
                    meta={"epoch": be, "min_err": res.min_err,
                          "phase2": bool(phase2),
                          **dataclasses.asdict(config)})
            if figures:
                try:
                    from gphm_tpu.utils.plotting import training_figure
                    training_figure(
                        solver, res,
                        os.path.join(directory, f"{run_name}.png"))
                except Exception as e:  # plotting must never kill a run
                    print(f"figure generation failed: {e}")

    used = time.time() - start
    err_dict = {
        "mean": float(np.mean(err_list)), "std": float(np.std(err_list)),
        "err_list": [float(e) for e in err_list],
        "stop_epoch_mean": float(np.mean(stop_epochs)),
        "used_time": used,
        "avg_time": used / max(config.num_fold, 1),
    }
    if directory:
        append_text_log(directory, run_name, err_dict)

    return ExperimentResult(
        config=config, err_mean=err_dict["mean"], err_std=err_dict["std"],
        err_list=err_dict["err_list"],
        stop_epoch_mean=err_dict["stop_epoch_mean"], used_time=used,
        fold_results=fold_results)


def run_sweep_experiment(config: RunConfig, freq_scales,
                         *, nepoch: Optional[int] = None,
                         verbose: bool = True):
    """Train all freq_scale variants of one config concurrently.

    Data parallelism as a product feature: the variant batch is vmapped and
    sharded over the mesh's data axis (the reference runs such sweeps as
    separate shell invocations, reference: code/run_1d.sh). Returns the
    per-variant min rel-L2 array in freq_scales order.
    """
    from gphm_tpu.parallel.sweep import run_sweep, sweep_variants

    nepoch = nepoch or config.nepoch
    if nepoch != config.nepoch:
        config = dataclasses.replace(config, nepoch=nepoch)
    solver = make_solver(config)
    mesh = None
    if config.mesh:
        from gphm_tpu.parallel.mesh import mesh_from_spec
        mesh = mesh_from_spec(config.mesh)
    batched = sweep_variants(solver, solver.init_params(),
                             freq_scales=freq_scales)
    start = time.time()
    _, errs, _ = run_sweep(solver, batched, nepoch, mesh=mesh)
    if verbose:
        print(f"{len(freq_scales)} variants x {nepoch} epochs in "
              f"{time.time() - start:.2f}s")
    return errs
