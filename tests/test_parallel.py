"""Mesh-sharded training on the 8-virtual-device CPU mesh.

Checks that the (DP x TP)-sharded 2D train step compiles, executes, and
produces the same numbers as the unsharded step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.models.base import make_step_fn
from gphm_tpu.models.solver_2d import Solver2D
from gphm_tpu.parallel.mesh import (device_put_params, make_mesh,
                                    shard_params_2d, sharded_train_step_2d)
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem

POLICY = Policy(dtype=jnp.float64, max_jitter_tries=0)
CFG = dict(Q=4, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
           freq_scale=20.0, jitter=1e-6)


def make_solver(N=32):
    prob = make_problem("poisson_2d-sin_sin", N_col=N, scale=2 * np.pi)
    return Solver2D(prob, "Matern52_Cos_1d", CFG, POLICY)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_tp_sharded_step_matches_unsharded():
    solver = make_solver(32)
    mesh = make_mesh((1, 8))
    params = solver.init_params()
    opt_state = solver.optimizer.init(params)

    step_ref = jax.jit(make_step_fn(solver._loss, solver.optimizer))
    p_ref, _, loss_ref = step_ref(params, opt_state)

    step, pshard = sharded_train_step_2d(solver, mesh)
    params_s = device_put_params(params, pshard)
    p_new, _, loss = step(params_s, opt_state)

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p_new["U"]),
                               np.asarray(p_ref["U"]), rtol=1e-9, atol=1e-12)
    # U really is sharded column-wise over the model axis
    assert len(p_new["U"].sharding.device_set) == 8


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_tp_sharded_cg_step():
    """Factorization-free CG mode also runs sharded: the Kronecker matvec is
    plain matmuls, so GSPMD partitions it over the model axis."""
    prob = make_problem("poisson_2d-sin_sin", N_col=32, scale=2 * np.pi)
    cfg = dict(CFG, logdet=False, solve="cg", cg_tol=1e-10, cg_maxiter=500)
    solver = Solver2D(prob, "Matern52_Cos_1d", cfg, POLICY)
    mesh = make_mesh((1, 8))
    params = solver.init_params()
    params["U"] = jnp.asarray(
        np.random.default_rng(3).normal(size=params["U"].shape) * 0.1)
    opt_state = solver.optimizer.init(params)

    step_ref = jax.jit(make_step_fn(solver._loss, solver.optimizer))
    _, _, loss_ref = step_ref(params, opt_state)

    step, pshard = sharded_train_step_2d(solver, mesh)
    params_s = device_put_params(params, pshard)
    _, _, loss = step(params_s, opt_state)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-8)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_dp_tp_batched_step():
    solver = make_solver(32)
    mesh = make_mesh((2, 4))
    B = 2
    params = solver.init_params()
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    opt_state = jax.vmap(solver.optimizer.init)(batched)

    step, pshard = sharded_train_step_2d(solver, mesh, batched=True)
    batched = device_put_params(batched, pshard)
    p_new, _, losses = step(batched, opt_state)

    assert losses.shape == (B,)
    # identical folds -> identical results on both data shards
    np.testing.assert_allclose(np.asarray(losses[0]), np.asarray(losses[1]),
                               rtol=1e-12)
    assert np.isfinite(np.asarray(losses)).all()


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_dp_sweep_over_freq_scales():
    """Concurrent hyperparameter sweep: batch sharded over the data axis."""
    from gphm_tpu.models.solver_1d import Solver1D
    from gphm_tpu.parallel.sweep import run_sweep, sweep_variants

    prob = make_problem("poisson_1d-single_sin", N_col=32, scale=2 * np.pi)
    solver = Solver1D(prob, "Matern52_Cos_1d",
                      dict(CFG, Q=4, freq_scale=20.0), POLICY)
    base = solver.init_params()
    batch = sweep_variants(solver, base, freq_scales=[10.0, 20.0, 30.0, 40.0])
    mesh = make_mesh((4, 2))
    params, errs, losses = run_sweep(solver, batch, nepoch=50, mesh=mesh,
                                     chunk=25)
    assert errs.shape == (4,) and np.isfinite(errs).all()
    assert losses.shape == (4,)
    # the variants genuinely differ
    assert len({round(float(e), 8) for e in errs}) > 1


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_dp_sweep_matches_sequential():
    from gphm_tpu.models.base import make_step_fn
    from gphm_tpu.models.solver_1d import Solver1D
    from gphm_tpu.parallel.sweep import run_sweep, sweep_variants

    prob = make_problem("poisson_1d-single_sin", N_col=24, scale=2 * np.pi)
    solver = Solver1D(prob, "Matern52_Cos_1d", dict(CFG, Q=4), POLICY)
    base = solver.init_params()
    batch = sweep_variants(solver, base, freq_scales=[15.0, 25.0])
    _, errs, _ = run_sweep(solver, batch, nepoch=30, chunk=30)

    # sequential replication of variant 1
    p = jax.tree_util.tree_map(jnp.copy, base)
    p["kernel_paras"]["freq"] = base["kernel_paras"]["freq"] * (25.0 / 20.0)
    o = solver.optimizer.init(p)
    step = jax.jit(make_step_fn(solver._loss, solver.optimizer))
    for _ in range(30):
        p, o, _ = step(p, o)
    np.testing.assert_allclose(float(solver.eval_err(p)), errs[1],
                               rtol=1e-9)


# ---------------------------------------------------------------------------
# Product surface: mesh-sharded *training runs* (VERDICT round-1 item #5) —
# solver.train(mesh=...) / run_experiment(config.mesh) execute the full
# chunked protocol (multi-eval, checkpoints, early stopping) sharded, and the
# trajectory matches single-device execution.
# ---------------------------------------------------------------------------

@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_mesh_train_2d_trajectory_matches_unsharded():
    mesh = make_mesh((2, 4))
    res_ref = make_solver(16).train(40, verbose=False, mode="chunked")
    res = make_solver(16).train(40, verbose=False, mesh=mesh)

    assert res.log["epoch_list"] == res_ref.log["epoch_list"]
    assert len(res.log["err_list"]) == 20
    np.testing.assert_allclose(res.log["err_list"], res_ref.log["err_list"],
                               rtol=1e-10)
    np.testing.assert_allclose(res.log["loss_list"], res_ref.log["loss_list"],
                               rtol=1e-10)
    np.testing.assert_allclose(res.min_err, res_ref.min_err, rtol=1e-10)
    # final params really live sharded on the mesh
    assert len(res.params["U"].sharding.device_set) == 8


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_mesh_train_1d_trajectory_matches_unsharded():
    from gphm_tpu.models.solver_1d import Solver1D

    def solver():
        prob = make_problem("poisson_1d-single_sin", N_col=32,
                            scale=2 * np.pi)
        return Solver1D(prob, "Matern52_Cos_1d", dict(CFG, Q=4), POLICY)

    mesh = make_mesh((1, 8))
    res_ref = solver().train(40, verbose=False, mode="chunked")
    res = solver().train(40, verbose=False, mesh=mesh)
    np.testing.assert_allclose(res.log["err_list"], res_ref.log["err_list"],
                               rtol=1e-10)
    np.testing.assert_allclose(res.log["loss_list"], res_ref.log["loss_list"],
                               rtol=1e-10)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_mesh_train_extra_two_gp_across_phase_switch():
    """The two-GP solver keeps its sharding through the phase switch (the
    phase-2 state is rebuilt and re-placed on the same mesh)."""
    from gphm_tpu.models.extra import Solver1DExtra

    def solver():
        prob = make_problem("poisson_1d-single_sin", N_col=32,
                            scale=2 * np.pi)
        return Solver1DExtra(prob, "Matern52_Cos_1d",
                             dict(CFG, Q=4, change_point=0.5), POLICY)

    mesh = make_mesh((2, 4))
    res_ref = solver().train(40, verbose=False)
    res = solver().train(40, verbose=False, mesh=mesh)
    np.testing.assert_allclose(res.log["err_list"], res_ref.log["err_list"],
                               rtol=1e-10)
    np.testing.assert_allclose(res.min_err, res_ref.min_err, rtol=1e-10)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_run_experiment_with_mesh_config(tmp_path):
    """CLI-level reachability: config.mesh drives a sharded run_experiment
    (checkpoints, metrics and figures-off path all live)."""
    from gphm_tpu.experiment import run_experiment
    from gphm_tpu.utils.config import load_config

    kw = dict(N_col=16, nepoch=40, Q=4, dtype="float64")
    res_ref = run_experiment(load_config("poisson_2d-sin_sin", **kw),
                             out_base=None, verbose=False, figures=False)
    res = run_experiment(load_config("poisson_2d-sin_sin", mesh="2x4", **kw),
                         out_base=str(tmp_path), verbose=False, figures=False)
    np.testing.assert_allclose(res.err_mean, res_ref.err_mean, rtol=1e-10)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_run_sweep_experiment_product_surface():
    from gphm_tpu.experiment import run_sweep_experiment
    from gphm_tpu.utils.config import load_config

    cfg = load_config("poisson_1d-single_sin", N_col=24, Q=4,
                      dtype="float64", mesh="4x2")
    errs = run_sweep_experiment(cfg, [10.0, 20.0, 30.0, 40.0], nepoch=30,
                                verbose=False)
    assert errs.shape == (4,) and np.isfinite(errs).all()


def test_mesh_from_spec_validation():
    from gphm_tpu.parallel.mesh import mesh_from_spec

    with pytest.raises(ValueError):
        mesh_from_spec("nonsense")
    with pytest.raises(ValueError):
        mesh_from_spec("99x99")
    m = mesh_from_spec("1x2")
    assert m.devices.shape == (1, 2)
    assert m.axis_names == ("data", "model")
