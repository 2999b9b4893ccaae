"""Post-hoc analysis layer: model rebuild from checkpoints, figure regen."""

import os

import numpy as np

from gphm_tpu.analysis import compare_runs, load_model, predict, rel_l2
from gphm_tpu.experiment import run_experiment
from gphm_tpu.utils.checkpoint import run_dir
from gphm_tpu.utils.config import load_config


def _run(tmp_path, equation, **over):
    cfg = load_config(equation, dtype="float64", **over)
    run_experiment(cfg, out_base=str(tmp_path), verbose=False, figures=False)
    return run_dir(str(tmp_path), cfg.equation, cfg.kernel, cfg.kernel_extra,
                   over.get("nepoch", cfg.nepoch), over.get("Q", cfg.Q)), cfg


def test_load_model_roundtrip_1d(tmp_path):
    d, cfg = _run(tmp_path, "poisson_1d-single_sin", nepoch=40, N_col=48,
                  Q=6)
    solver, params = load_model(d)
    err = rel_l2(solver, params)
    assert np.isfinite(err)
    p = predict(solver, params)
    assert p.shape == (300,)


def test_load_model_roundtrip_2d(tmp_path):
    d, cfg = _run(tmp_path, "poisson_2d-sin_sin", nepoch=20, N_col=16, Q=4)
    solver, params = load_model(d)
    assert predict(solver, params).shape == (300, 300)


def test_load_model_extra_two_phase(tmp_path):
    d, cfg = _run(tmp_path, "poisson_1d-mix_sin", nepoch=40, N_col=32, Q=4,
                  kernel_extra="Matern52_1d", change_point=0.1)
    # final state is phase-2 (the run crossed the switch)
    solver, params = load_model(d, prefer_best=False)
    assert params["extra"] is not None
    assert np.isfinite(rel_l2(solver, params))
    # the best checkpoint may be from either phase; it must load and
    # reproduce a finite error
    solver_b, params_b = load_model(d)
    assert np.isfinite(rel_l2(solver_b, params_b))


def test_load_model_roundtrip_profiled_whitened(tmp_path):
    """Profiled runs store the WHITENED latent (u = K ut) in the checkpoint;
    load_model must rebuild a profiled solver (u_mode from the sidecar
    config) whose solve-free prediction path reproduces the run's reported
    minimum error."""
    d, cfg = _run(tmp_path, "poisson_1d-single_sin", nepoch=60, N_col=48,
                  Q=6, u_mode="profiled")
    solver, params = load_model(d)
    assert solver.u_mode == "profiled" and solver.whitened
    import json
    with open(os.path.join(d, "metrics_fold0.jsonl")) as f:
        errs = [json.loads(l)["rel_l2"] for l in f if l.strip()]
    # the best checkpoint's recomputed error equals the best recorded eval
    np.testing.assert_allclose(rel_l2(solver, params), min(errs), rtol=1e-6)


def test_compare_runs_figure(tmp_path):
    d1, _ = _run(tmp_path, "poisson_1d-single_sin", nepoch=20, N_col=32, Q=4)
    out = str(tmp_path / "cmp.png")
    compare_runs([d1], out_path=out)
    assert os.path.exists(out)


def test_profiling_utils():
    from gphm_tpu.utils.profiling import (PhaseTimer, cholesky_flops,
                                          step_flops_1d, step_flops_2d, trace)
    t = PhaseTimer()
    with t.phase("a"):
        pass
    assert "a" in t.summary()
    assert cholesky_flops(400) == 400 ** 3 // 3
    assert step_flops_1d(400, 30) > 0
    assert step_flops_2d(400, 400, 30) > step_flops_1d(400, 30)
    with trace(None):
        pass


def test_load_model_roundtrip_mean_poly(tmp_path):
    """A run with a polynomial trend round-trips: the rebuilt solver carries
    n_beta, the checkpoint restores beta, and prediction includes the
    trend (finite error at the run's own level)."""
    d, cfg = _run(tmp_path, "poisson_1d-single_sin", nepoch=40, N_col=48,
                  Q=6, mean_poly=2, u_mode="profiled")
    solver, params = load_model(d)
    assert solver.n_beta == 3
    assert params["beta"].shape == (3, 1)
    assert np.isfinite(rel_l2(solver, params))
    assert predict(solver, params).shape == (300,)
