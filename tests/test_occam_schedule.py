"""Evidence tempering (occam_weight / --occam-schedule).

The profiled marginal objective's Occam correction can be scaled by a
static weight (0 = improper MAP-like with the marginal boundary
normalizer, 1 = exact marginal) and scheduled piecewise over the budget —
MAP speed early, properness in place before the impropriety cliff
(PARITY campaign Z; the mix_sin shipped default's rollback dependence).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphm_tpu.experiment import merged_schedule, run_experiment
from gphm_tpu.models.solver_1d import Solver1D
from gphm_tpu.models.solver_2d import Solver2D
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem
from gphm_tpu.utils.config import load_config

POLICY = Policy(dtype=jnp.float64, max_jitter_tries=0)
CFG = dict(Q=4, lr=0.01, llk_weight=100.0, logdet=True, tol=-1.0,
           freq_scale=10.0, jitter=1e-6, u_mode="profiled",
           profile_objective="marginal")


def cfg_for(**kw):
    return load_config("poisson_1d-single_sin", **kw)


def test_merged_schedule_dtype_only():
    c = cfg_for(dtype_schedule="float32:0.9,refined:0.1")
    assert merged_schedule(c, 1000) == [
        ("float32", 1.0, 900), ("refined", 1.0, 1000)]


def test_merged_schedule_occam_only():
    c = cfg_for(occam_schedule="0:0.4,1:0.6", dtype="float64")
    assert merged_schedule(c, 1000) == [
        ("float64", 0.0, 400), ("float64", 1.0, 1000)]


def test_merged_schedule_both_merge_on_boundary_union():
    c = cfg_for(dtype_schedule="float32:0.5,refined:0.5",
                occam_schedule="0:0.25,0.5:0.25,1:0.5")
    assert merged_schedule(c, 1000) == [
        ("float32", 0.0, 250), ("float32", 0.5, 500),
        ("refined", 1.0, 1000)]


def test_merged_schedule_static_fallback():
    c = cfg_for(dtype="float64", occam_weight=0.7)
    assert merged_schedule(c, 100) == [("float64", 0.7, 100)]


@pytest.mark.parametrize("dim", ["1d", "2d"])
def test_loss_is_affine_in_occam_weight(dim):
    """loss(ow) = base + ow * corr exactly: the half-weight loss is the
    midpoint of the 0- and 1-weight losses, and ow=1 reproduces the
    unweighted marginal objective bit-for-bit."""
    def build(ow):
        if dim == "1d":
            prob = make_problem("poisson_1d-single_sin", N_col=24,
                                scale=2 * np.pi)
            return Solver1D(prob, "Matern52_Cos_1d",
                            dict(CFG, occam_weight=ow), POLICY)
        prob = make_problem("poisson_2d-sin_sin", N_col=10, scale=2 * np.pi)
        return Solver2D(prob, "Matern52_Cos_1d",
                        dict(CFG, occam_weight=ow, profile_cg_iters=150),
                        POLICY)

    s1 = build(1.0)
    p = s1.init_params()
    p["log_tau"] = jnp.asarray(2.0)
    losses = {ow: float(build(ow)._loss(p)) for ow in (0.0, 0.5, 1.0)}
    np.testing.assert_allclose(losses[0.5],
                               0.5 * (losses[0.0] + losses[1.0]), rtol=1e-12)
    # ow=1 == the pre-feature marginal objective (no occam_weight key)
    if dim == "1d":
        prob = make_problem("poisson_1d-single_sin", N_col=24,
                            scale=2 * np.pi)
        plain = Solver1D(prob, "Matern52_Cos_1d", CFG, POLICY)
    else:
        prob = make_problem("poisson_2d-sin_sin", N_col=10, scale=2 * np.pi)
        plain = Solver2D(prob, "Matern52_Cos_1d",
                         dict(CFG, profile_cg_iters=150), POLICY)
    assert losses[1.0] == float(plain._loss(p))
    assert losses[0.0] != losses[1.0]  # the correction is not degenerate


def test_occam_schedule_runs_end_to_end(tmp_path):
    cfg = load_config("poisson_1d-single_sin", N_col=24, Q=4, nepoch=60,
                      dtype="float64", u_mode="profiled",
                      occam_schedule="0:0.5,1:0.5", n_evals=4)
    res = run_experiment(cfg, out_base=str(tmp_path), verbose=False,
                         figures=False)
    assert np.isfinite(res.err_mean)
    segs = res.fold_results[0].extras["segments"]
    assert [(d, w) for d, w, _ in segs] == [("float64", 0.0),
                                            ("float64", 1.0)]


def test_occam_weight_zero_skips_the_occam_factorization():
    """ow=0 must not pay for the S factorization: the jaxpr of the loss
    contains one fewer cholesky than the ow=1 loss."""
    prob = make_problem("poisson_1d-single_sin", N_col=24, scale=2 * np.pi)
    s0 = Solver1D(prob, "Matern52_Cos_1d", dict(CFG, occam_weight=0.0),
                  POLICY)
    s1 = Solver1D(prob, "Matern52_Cos_1d", dict(CFG, occam_weight=1.0),
                  POLICY)
    p = s1.init_params()
    n0 = str(jax.make_jaxpr(s0._loss)(p)).count("cholesky")
    n1 = str(jax.make_jaxpr(s1._loss)(p)).count("cholesky")
    assert n0 < n1


@pytest.mark.parametrize("dim", ["1d", "2d"])
def test_occam_ramp_weights_loss_continuously(dim):
    """occam_ramp (round-4 VERDICT #4): the Occam correction's weight is
    min(1, epoch/R) read from the device-side counter — at _epoch=0 the
    loss equals the ow=0 (MAP-normalizer) objective, at _epoch=R/2 the
    midpoint, at _epoch>=R the full marginal."""
    def build(**kw):
        if dim == "1d":
            prob = make_problem("poisson_1d-single_sin", N_col=24,
                                scale=2 * np.pi)
            return Solver1D(prob, "Matern52_Cos_1d", dict(CFG, **kw),
                            POLICY)
        prob = make_problem("poisson_2d-sin_sin", N_col=10, scale=2 * np.pi)
        return Solver2D(prob, "Matern52_Cos_1d",
                        dict(CFG, profile_cg_iters=150, **kw), POLICY)

    R = 100
    s = build(occam_ramp_epochs=R)
    p = s.init_params()
    assert "_epoch" in p
    p["log_tau"] = jnp.asarray(2.0)
    ow_losses = {ow: float(build(occam_weight=ow)._loss(
        {k: v for k, v in p.items() if k != "_epoch"}))
        for ow in (0.0, 0.5, 1.0)}
    for ep, expect in [(0.0, ow_losses[0.0]), (50.0, ow_losses[0.5]),
                       (100.0, ow_losses[1.0]), (250.0, ow_losses[1.0])]:
        got = float(s._loss({**p, "_epoch": jnp.asarray(ep, jnp.float32)}))
        np.testing.assert_allclose(got, expect, rtol=1e-12)


def test_occam_ramp_counter_advances_and_freezes():
    """The counter leaf advances once per optimizer step, survives the
    chunked trainer, and takes no gradient step of its own."""
    prob = make_problem("poisson_1d-single_sin", N_col=24, scale=2 * np.pi)
    s = Solver1D(prob, "Matern52_Cos_1d",
                 dict(CFG, occam_ramp_epochs=40), POLICY)
    res = s.train(30, verbose=False, mode="chunked")
    assert float(res.params["_epoch"]) == 30.0
    assert np.isfinite(res.min_err)


def test_occam_ramp_cli_config_plumbs_to_solver_dict():
    cfg = cfg_for(u_mode="profiled", dtype="float64", nepoch=1000,
                  occam_ramp=0.25)
    assert cfg.solver_dict()["occam_ramp_epochs"] == 250
    cfg0 = cfg_for(u_mode="profiled", dtype="float64", nepoch=1000)
    assert cfg0.solver_dict()["occam_ramp_epochs"] == 0


def test_occam_ramp_counter_survives_segmented_resume():
    """The ramp counter rides the checkpointed params, so a paused /
    resumed run (--stop-epoch + --resume, or a rotation restore) keeps
    the tempering weight continuous across the boundary."""
    prob = make_problem("poisson_1d-single_sin", N_col=24, scale=2 * np.pi)

    def fresh():
        return Solver1D(prob, "Matern52_Cos_1d",
                        dict(CFG, occam_ramp_epochs=40), POLICY)

    s = fresh()
    r1 = s.train(30, verbose=False, mode="chunked", stop_epoch=15)
    assert float(r1.params["_epoch"]) == 15.0
    r2 = fresh().train(30, verbose=False, mode="chunked", start_epoch=15,
                       init_state=(r1.params, r1.opt_state))
    assert float(r2.params["_epoch"]) == 30.0
    full = fresh().train(30, verbose=False, mode="chunked")
    np.testing.assert_allclose(float(full.min_err), float(r2.min_err),
                               rtol=1e-10)
