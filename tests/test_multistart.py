"""Frequency multi-start: vmapped warmup + criterion-based selection.

The MAP objective is oscillatory in the mixture frequencies, so a single
descent from the reference's linspace init can stall on hard high-frequency
configs (PARITY round-2 campaign on x2_add_sinx). ``multi_start`` warms up K
frequency initializations concurrently and continues the budget from the
best by the training criterion (no test-error peeking).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.models.base import make_step_fn
from gphm_tpu.models.solver_1d import Solver1D
from gphm_tpu.parallel.sweep import multi_start_train, multi_start_variants
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem

POLICY = Policy(dtype=jnp.float64, max_jitter_tries=0)
CFG = dict(Q=4, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
           freq_scale=20.0, jitter=1e-6, freq_init="linspace")


def make_solver(N=32, **kw):
    prob = make_problem("poisson_1d-single_sin", N_col=N, scale=2 * np.pi)
    return Solver1D(prob, "Matern52_Cos_1d", dict(CFG, **kw), POLICY)


def test_variants_shapes_and_diversity():
    solver = make_solver()
    K = 6
    batch = multi_start_variants(solver, K)
    freq = np.asarray(batch["kernel_paras"]["freq"])
    assert freq.shape == (K, 4)
    # variant 0 is the config's own init (linspace here)
    np.testing.assert_allclose(freq[0], np.linspace(0, 1, 4) * 20.0)
    # all variants distinct
    assert len({tuple(np.round(f, 6)) for f in freq}) == K
    # config untouched by the spectral-probe toggle
    assert solver.config["freq_init"] == "linspace"
    # non-frequency parameters are shared across starts
    u = np.asarray(batch["u"])
    assert u.shape[0] == K and np.all(u == u[0])


def test_variants_deterministic():
    f1 = np.asarray(multi_start_variants(make_solver(), 8)
                    ["kernel_paras"]["freq"])
    f2 = np.asarray(multi_start_variants(make_solver(), 8)
                    ["kernel_paras"]["freq"])
    np.testing.assert_array_equal(f1, f2)


def test_multi_start_picks_criterion_argmin_and_matches_sequential():
    solver = make_solver(24)
    K, warmup = 3, 30
    params, opt_state, info = multi_start_train(
        solver, warmup, K, chunk=30, verbose=False)
    assert info["chosen"] == int(np.argmin(info["criteria"]))
    assert info["warmup_epochs"] == warmup and info["n_starts"] == K

    # sequential replication of the chosen variant reaches the same state
    batch = multi_start_variants(solver, K)
    p = jax.tree_util.tree_map(lambda x: jnp.copy(x[info["chosen"]]), batch)
    o = solver.optimizer.init(p)
    step = jax.jit(make_step_fn(solver._loss, solver.optimizer))
    for _ in range(warmup):
        p, o, _ = step(p, o)
    np.testing.assert_allclose(np.asarray(params["kernel_paras"]["freq"]),
                               np.asarray(p["kernel_paras"]["freq"]),
                               rtol=1e-9)
    np.testing.assert_allclose(float(solver.criterion(params)),
                               float(solver.criterion(p)), rtol=1e-9)
    # returned opt_state continues cleanly from the warmup
    p2, _, loss = step(params, opt_state)
    assert np.isfinite(float(loss))


def test_multi_start_batched_matches_all_at_once():
    # sequential groups (HBM-fitting path: 8 starts at N_col=900 want
    # ~28 GB on a 16 GB v5e) must pick the same winner and return the
    # same warmed state as the single vmapped batch
    solver = make_solver(24)
    K, warmup = 5, 30
    p_all, o_all, i_all = multi_start_train(
        solver, warmup, K, chunk=30, verbose=False)
    p_b, o_b, i_b = multi_start_train(
        solver, warmup, K, chunk=30, batch=2, verbose=False)
    assert i_b["chosen"] == i_all["chosen"]
    np.testing.assert_allclose(i_b["criteria"], i_all["criteria"],
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(p_b["kernel_paras"]["freq"]),
                               np.asarray(p_all["kernel_paras"]["freq"]),
                               rtol=1e-9)
    step = jax.jit(make_step_fn(solver._loss, solver.optimizer))
    _, _, loss = step(p_b, o_b)
    assert np.isfinite(float(loss))


def test_run_experiment_multi_start_batch_plumbs(tmp_path):
    from gphm_tpu.experiment import run_experiment
    from gphm_tpu.utils.config import load_config

    res = run_experiment(
        load_config("poisson_1d-single_sin", multi_start=3,
                    multi_start_frac=0.25, multi_start_batch=2,
                    N_col=24, nepoch=40, Q=4, dtype="float64"),
        out_base=str(tmp_path), verbose=False, figures=False)
    assert np.isfinite(res.err_mean)


def test_run_experiment_multi_start(tmp_path):
    from gphm_tpu.experiment import run_experiment
    from gphm_tpu.utils.config import load_config

    kw = dict(N_col=24, nepoch=40, Q=4, dtype="float64")
    res = run_experiment(
        load_config("poisson_1d-single_sin", multi_start=3,
                    multi_start_frac=0.25, **kw),
        out_base=str(tmp_path), verbose=False, figures=False)
    assert np.isfinite(res.err_mean)
    # warmup consumed 10 epochs: evals resume at absolute cadence afterwards
    logged = res.fold_results[0].log["epoch_list"]
    assert logged and min(logged) >= 10
    # the multi-start record landed in the metrics log
    import json
    mpath = tmp_path / "poisson_1d-single_sin" / "kernel_Matern52_Cos_1d" / \
        "epoch_40" / "Q4" / "metrics_fold0.jsonl"
    recs = [json.loads(l) for l in open(mpath)]
    ms = [r for r in recs if "multi_start" in r]
    assert len(ms) == 1 and ms[0]["multi_start"]["n_starts"] == 3


def test_run_experiment_multi_start_with_schedule(tmp_path):
    from gphm_tpu.experiment import run_experiment
    from gphm_tpu.utils.config import load_config

    kw = dict(N_col=24, nepoch=40, Q=4)
    res = run_experiment(
        load_config("poisson_1d-single_sin", multi_start=2,
                    multi_start_frac=0.25,
                    dtype_schedule="float64:0.5,float64:0.5", **kw),
        out_base=str(tmp_path), verbose=False, figures=False)
    assert np.isfinite(res.err_mean)


def test_multi_start_rejects_warmup_past_change_point():
    from gphm_tpu.experiment import run_experiment
    from gphm_tpu.utils.config import load_config

    cfg = load_config("poisson_1d-single_sin", N_col=24, nepoch=40, Q=4,
                      dtype="float64", kernel_extra="Matern52_1d",
                      change_point=0.1, multi_start=2, multi_start_frac=0.5)
    with pytest.raises(ValueError, match="change point"):
        run_experiment(cfg, out_base=None, verbose=False, figures=False)


def test_multi_start_extra_family_before_change_point(tmp_path):
    from gphm_tpu.experiment import run_experiment
    from gphm_tpu.utils.config import load_config

    res = run_experiment(
        load_config("poisson_1d-single_sin", N_col=24, nepoch=40, Q=4,
                    dtype="float64", kernel_extra="Matern52_1d",
                    change_point=0.5, multi_start=2, multi_start_frac=0.25),
        out_base=str(tmp_path), verbose=False, figures=False)
    assert np.isfinite(res.err_mean)
