"""Shared training driver: chunked lax.scan epochs with reference eval cadence.

The reference trains with a Python-level loop dispatching one jitted step per
epoch plus tqdm (reference: code/model_GP_solver_1d.py:234-276) — on TPU that
would be dispatch-latency-bound. Here the epochs between evaluation points run
as a single ``lax.scan`` inside one jitted call, so the device executes
thousands of optimization steps per host round-trip. Host synchronization
happens only at the reference's evaluation cadence: an eval after step ``i``
whenever ``i % (nepoch / 20) == 0`` (reference: code/model_GP_solver_1d.py:242),
which is also where min-error tracking and early stopping live.

Early-stop modes reproduce each reference solver's behaviour:
  * "off"          — 1D single / advection (the check is commented out there,
                     reference: code/model_GP_solver_1d.py:272-276,
                     code/model_GP_solver_advection.py:322-328).
  * "tol"          — 2D: stop when criterion < tol, only if tol > 0
                     (reference: code/model_GP_solver_2d.py:327-332).
  * "tol_or_count" — extra-GP: stop when i > 0 and (criterion < tol or the
                     eval error rose above the running min by > 1e-3 more than
                     7 times) (reference: code/model_GP_solver_1d_extra.py:317-322).
                     The reference's 7 is calibrated to its hard-coded
                     20-eval cadence (8 rising evals = 40% of the run); with a
                     denser ``--n-evals`` the count is scaled proportionally so
                     the patience stays a fixed fraction of the epoch budget
                     rather than collapsing to a few hundred epochs (observed:
                     n_evals=400 killed a two-GP run 400 epochs after its
                     phase switch).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class TrainState:
    """Mutable driver state; phase hooks may swap the callables mid-run."""

    params: dict
    opt_state: object
    run_chunk: Callable          # (params, opt_state, nsteps) -> (p, s, loss)
    eval_fn: Callable            # params -> relative-L2 error (device scalar)
    criterion_fn: Callable       # params -> early-stop criterion
    param_log_fn: Optional[Callable] = None
    opt_init: Optional[Callable] = None  # params -> fresh optimizer state
                                         # (nan_policy="rollback" uses it to
                                         # drop the blown-up Adam moments)


@dataclasses.dataclass
class TrainResult:
    params: dict
    opt_state: object
    log: Dict[str, List]
    min_err: float
    early_stopping: Dict
    wall_time: float
    extras: Dict = dataclasses.field(default_factory=dict)


def eval_epochs(nepoch: int, n_evals: int = 20) -> List[int]:
    """Epoch indices after which the reference evaluates: i % (nepoch/20) == 0
    with float modulo (reference: code/model_GP_solver_1d.py:242).
    ``n_evals`` generalizes the reference's hard-coded 20: the two-GP
    solvers' post-switch error dips sharply and then drifts under the
    phase-2 MAP objective, so a denser cadence both records the dip and
    lets the error-increase early stop fire near it."""
    period = nepoch / n_evals
    if period <= 0:
        return list(range(nepoch))
    if period == int(period):
        # exact reference semantics: i % (nepoch/20) == 0 (float modulo)
        return [i for i in range(nepoch) if i % period == 0]
    # Non-integer period: the reference's float modulo matches (almost)
    # only i=0 — e.g. nepoch=20000, n_evals=150 silently degrades to a
    # single eval at epoch 0 and the run records nothing (observed live:
    # a 20k-epoch two-GP run whose post-switch dip went unrecorded).
    # Spread n_evals points evenly instead.
    return sorted({min(int(round(j * period)), nepoch - 1)
                   for j in range(n_evals)})


def freezable_adam(lr: float, freeze=None, decay_steps=None,
                   lr_floor: float = 1.0) -> optax.GradientTransformation:
    """Adam with optional parameter freezing and optional cosine lr decay.

    ``freeze`` is a list of '/'-joined parameter paths (e.g.
    ["kernel_paras/freq", "log_tau"]); matching subtrees get zero updates.
    Functional replacement for the reference's dead-code ``frezze_paras``
    hook (reference: code/kernel_matrix.py:87-104), done at the optimizer
    level so the loss stays untouched.

    ``decay_steps``/``lr_floor`` < 1 turn the constant lr into a cosine
    decay to ``lr * lr_floor`` over ``decay_steps`` optimizer steps — the
    tail-stabilization knob for the profiled marginal objective, whose
    fixed-lr trajectories oscillate around the optimum once the evidence
    surface sharpens (measured: single_sin rel-L2 bouncing 3e-1 <-> 6e-4
    late in the budget at lr=0.01). The schedule keys off the optimizer's
    own step count, so it is exact across chunked eval segments, dtype
    schedules, and checkpoint resume. Defaults reproduce plain Adam with
    an identical state structure.
    """
    if decay_steps and lr_floor < 1.0:
        lr = optax.cosine_decay_schedule(
            init_value=lr, decay_steps=int(decay_steps), alpha=lr_floor)
    adam = optax.adam(learning_rate=lr)
    if not freeze:
        return adam

    def labels(params):
        def leaf_label(path, _leaf):
            keys = [getattr(p, "key", getattr(p, "idx", "")) for p in path]
            pstr = "/".join(str(k) for k in keys)
            frozen = any(pstr == f or pstr.startswith(f + "/")
                         for f in freeze)
            return "frozen" if frozen else "train"

        return jax.tree_util.tree_map_with_path(leaf_label, params)

    return optax.multi_transform(
        {"train": adam, "frozen": optax.set_to_zero()}, labels)


def make_step_fn(loss_fn: Callable, optimizer: optax.GradientTransformation,
                 prepare: Optional[Callable] = None):
    """One optimization step (reference: code/model_GP_solver_1d.py:151-158).

    ``prepare`` (params -> params) runs first, under the trace: profiled-u
    solvers use it to overwrite the latent with its closed-form conditional
    optimum u*(theta) each step (the envelope theorem makes the remaining
    value_and_grad the exact profiled gradient; the "u" leaf is frozen in
    the optimizer so its numerically-tiny residual gradient cannot drift it).
    """

    def step(params, opt_state):
        if prepare is not None:
            params = prepare(params)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if "_epoch" in params:
            # device-side step counter for continuous loss schedules (the
            # Occam tempering ramp): frozen in the optimizer, advanced
            # here, read under stop_gradient by the loss
            params = {**params, "_epoch": params["_epoch"] + 1.0}
        return params, opt_state, loss

    return step


def make_chunk_runner(loss_fn: Callable,
                      optimizer: optax.GradientTransformation,
                      prepare: Optional[Callable] = None):
    """Jitted step loop with a DYNAMIC trip count; returns final loss only.

    ``nsteps`` is a traced operand (``lax.fori_loop``), not a static jit
    argument: the runner compiles ONCE per training phase no matter how
    launch lengths vary. The static-length scan it replaces re-lowered the
    full step body for every distinct launch length the adaptive sizing in
    ``chunked_train`` produced (ramp, steady, remainder); on the refined
    profiled tier a single such compile takes minutes, which starved
    dense-eval-cadence runs outright (measured: the round-4 x_time_sinx
    shipped-default leg delivered ONE eval in 1500 s). ``lax.scan`` lowers
    to the same XLA While, so the dynamic bound costs nothing per step.
    The first step runs outside the loop: ``nsteps >= 1`` always holds
    here, and it gives the carried loss its concrete dtype without an
    extra ``eval_shape``.
    """
    step_fn = make_step_fn(loss_fn, optimizer, prepare)

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(params, opt_state, nsteps):
        params, opt_state, loss = step_fn(params, opt_state)

        def body(_, carry):
            p, o, _ = carry
            return step_fn(p, o)

        return jax.lax.fori_loop(0, nsteps - 1, body,
                                 (params, opt_state, loss))

    return run_chunk


def make_fused_trainer(loss_fn: Callable,
                       optimizer: optax.GradientTransformation,
                       eval_fn: Callable, criterion_fn: Callable,
                       param_log_fn: Optional[Callable],
                       nepoch: int, n_evals: int = 20,
                       prepare: Optional[Callable] = None):
    """Whole-run training as ONE jitted program (TPU flagship mode).

    The reference protocol — eval after step ``i`` whenever
    ``i % (nepoch/20) == 0`` — becomes an outer ``lax.scan`` over the 20
    evaluation chunks (inner ``fori_loop`` of optimization steps), with the
    per-eval scalars (loss, rel-L2 error, early-stop criterion) and mixture
    statistics written to device-side buffers. One compile, one host sync
    for the entire run; no early stopping (callers with an active stop rule
    use chunked_train).

    Requires ``nepoch % n_evals == 0`` (true for every shipped config:
    nepoch is 1e5/2e5/1e6/3e6).
    """
    if nepoch % n_evals != 0 or nepoch < n_evals:
        raise ValueError(f"fused trainer needs nepoch divisible by "
                         f"{n_evals}, got {nepoch}")
    E = nepoch // n_evals
    step_fn = make_step_fn(loss_fn, optimizer, prepare)

    def run_steps(carry, n):
        def body(_, c):
            params, opt_state, _ = c
            return step_fn(params, opt_state)

        return jax.lax.fori_loop(0, n, body, carry)

    @jax.jit
    def train(params, opt_state):
        loss_dtype = jax.eval_shape(loss_fn, params).dtype
        carry = (params, opt_state, jnp.zeros((), loss_dtype))

        def chunk(carry, idx):
            n = jnp.where(idx == 0, 1, E)
            carry = run_steps(carry, n)
            params = carry[0]
            rec = {"loss": carry[2], "err": eval_fn(params),
                   "criterion": criterion_fn(params)}
            if param_log_fn is not None:
                rec.update(param_log_fn(params))
            return carry, rec

        carry, logs = jax.lax.scan(chunk, carry, jnp.arange(n_evals))
        carry = run_steps(carry, E - 1)  # tail after the last eval
        params, opt_state, _ = carry
        return params, opt_state, logs

    epochs = [0] + [E * k for k in range(1, n_evals)]
    return train, epochs


def fused_train(*, solver, params=None, nepoch: int,
                verbose: bool = True, on_eval=None) -> TrainResult:
    """Run the fused trainer and convert device logs to the reference's
    host-side log_dict layout (loss transformed with log when > 1,
    min-error tracking from eval snapshots)."""
    optimizer = solver.optimizer
    params = params if params is not None else solver.init_params()
    opt_state = optimizer.init(params)
    param_log_fn = getattr(solver, "param_log", None)
    if param_log_fn is not None:
        param_log_fn = jax.jit(param_log_fn)
    train, epochs = make_fused_trainer(
        solver._loss, optimizer, solver._eval_err, solver._criterion,
        param_log_fn, nepoch,
        prepare=getattr(solver, "_prepare_step", None))

    start = time.time()
    params, opt_state, logs = train(params, opt_state)
    jax.block_until_ready(params)
    wall = time.time() - start

    logs = {k: np.asarray(v) for k, v in logs.items()}
    losses = logs.pop("loss")
    errs = logs.pop("err")
    criteria = logs.pop("criterion")
    log: Dict[str, List] = {
        "loss_list": [float(np.log(l)) if l > 1 else float(l)
                      for l in losses],
        "err_list": [float(e) for e in errs],
        "epoch_list": list(epochs),
        "criterion_list": [float(c) for c in criteria],
    }
    for k, v in logs.items():
        log[k] = [v[i] for i in range(v.shape[0])]

    min_err = min([2.0] + log["err_list"])
    if verbose:
        for i, e in enumerate(log["epoch_list"]):
            print(f"It {e}  loss = {losses[i]:g}  rel-L2 {errs[i]:g}  "
                  f"criterion {criteria[i]:g}")
    if on_eval is not None:
        for i, e in enumerate(log["epoch_list"]):
            on_eval(e, log["err_list"][i], float(losses[i]))

    return TrainResult(params=params, opt_state=opt_state, log=log,
                       min_err=min_err,
                       early_stopping={"flag": False, "epoch": nepoch},
                       wall_time=wall)


def chunked_train(
    *,
    state: TrainState,
    nepoch: int,
    tol: float = -1.0,
    early_stop_mode: str = "off",
    phase_boundaries: Optional[List[int]] = None,
    phase_hook: Optional[Callable] = None,   # (epoch, state) -> state
    on_eval: Optional[Callable] = None,      # host callback(epoch, err, loss)
    on_checkpoint: Optional[Callable] = None,  # (epoch, params, opt_state,
                                               #  stats) — stats carries the
                                               # running min_err / counter so
                                               # resume restores them
    nan_policy: str = "warn",                # "warn" | "raise" | "rollback"
    max_recoveries: int = 3,                 # rollback attempts before the
                                             # run stops itself
    start_epoch: int = 0,
    stop_epoch: Optional[int] = None,        # run [start_epoch, stop_epoch)
                                             # of the nepoch-budget protocol
                                             # (precision schedules / tests);
                                             # eval cadence stays absolute
    min_err0: float = 2.0,                   # resume: pre-crash running min
    error_increase_count0: int = 0,
    max_launch: int = 5000,                  # steps per device launch; keep
                                             # each launch well under ~1 min
                                             # of device time (watchdog)
    early_stop_after: int = 0,               # arm the early stop only from
                                             # this epoch (two-GP family: the
                                             # change point — phase-1 test
                                             # error is meaningless before
                                             # the extra GP exists, and dense
                                             # eval cadences otherwise fire
                                             # the rise counter pre-switch)
    n_evals: int = 20,                       # eval-cadence points per budget
                                             # (reference hard-codes 20)
    final_state: str = "last",               # "last" (reference semantics:
                                             # the params at the budget end)
                                             # | "best" (the argmin-eval
                                             # snapshot — walk-away
                                             # containment, VERDICT r4 #8:
                                             # profiled single-GP marginal
                                             # tails can drift several x off
                                             # their own min after the last
                                             # improvement; "best" makes the
                                             # run END at its best state, so
                                             # the final error IS min_err)
    verbose: bool = True,
) -> TrainResult:
    """Run the reference training protocol with scan-fused epochs.

    ``phase_boundaries`` are epoch counts at which ``phase_hook`` must run
    (e.g. the two-GP change point); chunks are split there as well as at the
    evaluation cadence. ``start_epoch > 0`` resumes a crashed run from a
    rolling checkpoint: the eval cadence stays aligned to the original
    absolute epochs, and ``min_err0``/``error_increase_count0`` seed the
    min-error tracking so the reported aggregate covers the whole run, not
    just the post-crash tail.
    """
    evals = eval_epochs(nepoch, n_evals)
    eval_set = set(e for e in evals if e >= start_epoch)

    end = nepoch if stop_epoch is None else min(int(stop_epoch), nepoch)
    targets = sorted(set(
        [e + 1 for e in evals] + [end]
        + [b for b in (phase_boundaries or []) if 0 < b < end]))
    targets = [t for t in targets if start_epoch < t <= end]

    start = time.time()
    log: Dict[str, List] = {"loss_list": [], "err_list": [], "epoch_list": []}
    # reference sentinel (code/model_GP_solver_1d.py:227); seeded from the
    # checkpoint on resume
    min_err = float(min_err0)
    threshold = 1e-3
    error_increase_count = int(error_increase_count0)
    early_stopping = {"flag": False, "epoch": nepoch}
    fired = set()

    # Single device executions are capped (a multi-minute XLA launch can trip
    # infrastructure timeouts — observed: a 5000-step refined launch at
    # ~48 ms/step and a 150-step 2D-trend launch at ~1.4 s/step both crashed
    # the TPU worker, while ~17 s launches ride through). The cap adapts to
    # the measured step rate: the first launches are a short ramp, the warm
    # rate then sets a steady launch length that fits LAUNCH_TARGET_S of
    # device time, quantized to powers of two to keep the length sequence
    # stable. The chunk runner takes the length as a traced operand, so
    # only the FIRST launch after (re)construction pays a compile — any
    # launch after that is warm regardless of its length.
    LAUNCH_TARGET_S = 20.0
    RAMP = 8
    seen_lengths: set = set()  # non-empty <=> the runner has compiled
    rate = [None]  # warm seconds/step (best observed)

    def run_steps(nsteps):
        nonlocal max_launch
        loss = None
        while nsteps > 0:
            cap = max_launch if rate[0] is not None else RAMP
            k = min(nsteps, cap)
            warm = bool(seen_lengths)
            t0 = time.time()
            state.params, state.opt_state, loss = state.run_chunk(
                state.params, state.opt_state, k)
            if warm:
                jax.block_until_ready(loss)
                r = (time.time() - t0) / k
                rate[0] = r if rate[0] is None else min(rate[0], r)
                fit = int(LAUNCH_TARGET_S / max(rate[0], 1e-9))
                q = RAMP
                while q * 2 <= fit:
                    q *= 2
                max_launch = min(max_launch, q)
            seen_lengths.add(k)
            nsteps -= k
        return loss

    epoch = start_epoch
    loss = float("nan")
    best_params, best_epoch = None, None
    # nan_policy="rollback" state: a copy of the last finite
    # (params, opt_state) pair, refreshed at every finite eval. Seeded
    # with the initial state so even a first-eval blow-up can roll back
    # (onto fresh optimizer moments) instead of training on NaN.
    recoveries = 0
    # banded finite explosions (10 < err <= 1e6) must persist across TWO
    # consecutive evals before they count as divergence — at the sparse
    # 20-eval cadence a single excursion can be a legitimate optimizer
    # spike, and a rollback discards the Adam moments (ADVICE round 3)
    band_pending = False
    copy_tree = partial(jax.tree_util.tree_map, jnp.copy)
    last_good = ((copy_tree(state.params), copy_tree(state.opt_state),
                  start_epoch - 1)
                 if nan_policy == "rollback" else None)
    for t in targets:
        nsteps = t - epoch
        if nsteps > 0:
            loss = run_steps(nsteps)
        epoch = t

        if phase_hook is not None and epoch in (phase_boundaries or []) \
                and epoch not in fired:
            fired.add(epoch)
            state = phase_hook(epoch, state)
            # phase-1 snapshots have the wrong parameter structure for the
            # phase-2 chunk runner — never roll back across the switch;
            # re-seed with the fresh phase-2 state instead
            last_good = ((copy_tree(state.params),
                          copy_tree(state.opt_state), epoch - 1)
                         if nan_policy == "rollback" else None)
            # the phase-2 compiled program has a different step cost: a
            # launch cap fit to the phase-1 rate could overshoot
            # LAUNCH_TARGET_S by the slowdown factor, and the first
            # post-switch launch of an already-seen length would fold its
            # compile time into a "warm" rate sample. Forget the phase-1
            # measurements and re-ramp (the cap itself stays: it can only
            # shrink further, which is the safe direction).
            rate[0] = None
            seen_lengths.clear()

        i = epoch - 1
        if i in eval_set:
            err = float(state.eval_fn(state.params))
            loss_f = float(loss)

            # NaN/inf guard — the reference trains blindly through
            # divergence and only papers over NaNs in post-hoc analysis
            # (SURVEY §5 "failure detection"). A non-finite state is never
            # written to the rolling checkpoint (resuming from it could
            # only continue the divergence). Finite explosions count too:
            # divergence can overflow the latent without reaching inf
            # (measured: the 2D MAP-profiled sin_sin probe rode err ~ 1e72
            # for a thousand epochs, every value finite) — err > 1e6
            # always fires immediately, and once the run has made real
            # progress (min_err < 1) so does err > max(10, 1000x the best
            # seen) (measured: the advection MAP cliff burned 3300 epochs
            # at finite err 12..353 from a min of 8.4e-3, campaign T) —
            # but the banded form only after TWO consecutive exploded
            # evals, so a single-eval optimizer spike at sparse cadence
            # never costs the Adam moments (the largest healthy spike on
            # record is sin_cos's single-eval 1.38 from min 3.1e-4,
            # campaign R; the real cliffs persist for many evals).
            finite = np.isfinite(loss_f) and np.isfinite(err)
            hard_fail = not finite or err > 1e6
            banded = (finite and not hard_fail and min_err < 1.0
                      and err > max(10.0, 1e3 * min_err))
            if banded and not band_pending:
                # first banded excursion: record it honestly, keep the
                # state, arm the two-in-a-row trigger
                band_pending = True
                print(f"WARNING: rel-L2 excursion at epoch {i}: "
                      f"err={err:g} (min {min_err:g}); rollback armed "
                      f"for the next eval")
                log["loss_list"].append(loss_f)
                log["err_list"].append(err)
                log["epoch_list"].append(i)
                if on_eval is not None:
                    on_eval(i, err, loss_f)
                continue
            if hard_fail or banded:
                band_pending = False
                msg = (f"non-finite/diverged training state at epoch {i}: "
                       f"loss={loss_f}, rel-L2={err}")
                if nan_policy == "raise":
                    raise FloatingPointError(msg)
                print("WARNING:", msg)  # surfaced even in quiet runs
                log["loss_list"].append(loss_f)
                log["err_list"].append(err)
                log["epoch_list"].append(i)
                if on_eval is not None:
                    on_eval(i, err, loss_f)
                if nan_policy == "rollback" and last_good is not None:
                    if recoveries >= max_recoveries:
                        early_stopping = {"flag": True, "epoch": i,
                                          "reason": "nan"}
                        # hand back the last finite state, not the NaNs
                        state.params = copy_tree(last_good[0])
                        state.opt_state = copy_tree(last_good[1])
                        print(f"stopping at epoch {i}: still non-finite "
                              f"after {recoveries} rollbacks")
                        break
                    recoveries += 1
                    state.params = copy_tree(last_good[0])
                    # fresh optimizer state: the saved Adam moments are what
                    # drove the blow-up; re-initializing changes the
                    # trajectory enough to escape a deterministic re-NaN
                    state.opt_state = (state.opt_init(state.params)
                                       if state.opt_init is not None
                                       else copy_tree(last_good[1]))
                    print(f"rollback {recoveries}/{max_recoveries}: "
                          f"restored epoch-{last_good[2]} state, "
                          f"continuing at epoch {i}")
                continue

            band_pending = False  # healthy eval: disarm the trigger
            if err < min_err:
                min_err = err
                # keep the argmin state: sharp post-dip drift (two-GP
                # phase 2) can leave the final params far worse than the
                # reported min (the reference stores only final params,
                # code/utils.py:580-597). Copy, not alias: the chunk
                # runner donates its input buffers.
                best_params = jax.tree_util.tree_map(jnp.copy, state.params)
                best_epoch = i
            elif err - min_err > threshold and i >= early_stop_after:
                error_increase_count += 1

            log["loss_list"].append(np.log(loss_f) if loss_f > 1 else loss_f)
            log["err_list"].append(err)
            log["epoch_list"].append(i)
            if state.param_log_fn is not None:
                for k, v in state.param_log_fn(state.params).items():
                    log.setdefault(k, []).append(np.asarray(v))

            criterion = float(state.criterion_fn(state.params))
            if verbose:
                print(f"It {i}  loss = {loss_f:g}  rel-L2 {err:g}  "
                      f"min {min_err:g}  criterion {criterion:g}")
            if on_eval is not None:
                on_eval(i, err, loss_f)
            if on_checkpoint is not None:
                on_checkpoint(i, state.params, state.opt_state,
                              {"min_err": min_err,
                               "error_increase_count": error_increase_count})

            if nan_policy == "rollback":
                # copy, not alias: the chunk runner donates its inputs
                last_good = (copy_tree(state.params),
                             copy_tree(state.opt_state), i)

            stop = False
            if early_stop_mode == "tol":
                stop = tol > 0 and criterion < tol
            elif early_stop_mode == "tol_or_count":
                # cadence-invariant patience: 7 at the reference's 20-eval
                # cadence, scaled so it always spans the same ~40% of the
                # epoch budget (see module docstring)
                patience = max(7, (7 * n_evals) // 20)
                stop = i > 0 and i >= early_stop_after \
                    and (criterion < tol or error_increase_count > patience)
            if stop:
                early_stopping = {"flag": True, "epoch": i}
                if verbose:
                    print(f"early stop at epoch {i}")
                break

    if stop_epoch is not None and on_checkpoint is not None \
            and epoch == end and (end - 1) not in eval_set:
        # bounded segment ends between eval points: checkpoint the stop
        # state so a --resume continuation loses nothing — unless it is
        # non-finite (resuming from a diverged state is never useful)
        finite = all(bool(np.all(np.isfinite(x)))
                     for x in jax.tree_util.tree_leaves(state.params))
        if finite:
            on_checkpoint(end - 1, state.params, state.opt_state,
                          {"min_err": min_err,
                           "error_increase_count": error_increase_count})
        else:
            print(f"WARNING: segment end state at epoch {end - 1} is "
                  f"non-finite; rolling checkpoint not updated")

    if final_state == "best" and best_params is not None:
        # hand back the argmin-eval snapshot as THE final state (the
        # metrics stream still records the full trajectory, walk-away
        # included; opt_state stays the last one — an Adam moment set
        # matched to different params is not meaningful to resume from,
        # and resume reads the rolling checkpoint, not this)
        state.params = best_params
    return TrainResult(params=state.params, opt_state=state.opt_state,
                       log=log, min_err=min_err,
                       early_stopping=early_stopping,
                       wall_time=time.time() - start,
                       extras={"error_increase_count": error_increase_count,
                               "last_epoch": epoch,
                               "best_params": best_params,
                               "best_epoch": best_epoch,
                               "nan_recoveries": recoveries})
