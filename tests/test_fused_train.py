"""Fused on-device trainer vs chunked host-driven trainer: identical math."""

import jax.numpy as jnp
import numpy as np

from gphm_tpu.models.solver_1d import Solver1D
from gphm_tpu.models.solver_2d import Solver2D
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem

POLICY = Policy(dtype=jnp.float64, max_jitter_tries=0)
CFG = dict(Q=5, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
           freq_scale=20.0, jitter=1e-6)


def test_fused_matches_chunked_1d():
    prob = make_problem("poisson_1d-single_sin", N_col=40, scale=2 * np.pi)
    solver = Solver1D(prob, "Matern52_Cos_1d", CFG, POLICY)
    fused = solver.train(nepoch=100, verbose=False, mode="fused")
    chunked = solver.train(nepoch=100, verbose=False, mode="chunked")
    assert fused.log["epoch_list"] == chunked.log["epoch_list"]
    np.testing.assert_allclose(fused.log["err_list"],
                               chunked.log["err_list"], rtol=1e-9)
    np.testing.assert_allclose(fused.log["loss_list"],
                               chunked.log["loss_list"], rtol=1e-9)
    np.testing.assert_allclose(fused.min_err, chunked.min_err, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(fused.params["u"]),
                               np.asarray(chunked.params["u"]), rtol=1e-8,
                               atol=1e-12)


def test_fused_matches_chunked_2d():
    prob = make_problem("poisson_2d-sin_sin", N_col=20, scale=2 * np.pi)
    solver = Solver2D(prob, "Matern52_Cos_1d", CFG, POLICY)
    fused = solver.train(nepoch=60, verbose=False, mode="fused")
    chunked = solver.train(nepoch=60, verbose=False, mode="chunked")
    np.testing.assert_allclose(fused.log["err_list"],
                               chunked.log["err_list"], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(fused.params["U"]),
                               np.asarray(chunked.params["U"]), rtol=1e-8,
                               atol=1e-12)


def test_fused_rejects_indivisible():
    prob = make_problem("poisson_1d-single_sin", N_col=30, scale=2 * np.pi)
    solver = Solver1D(prob, "Matern52_Cos_1d", CFG, POLICY)
    # auto mode falls back to chunked for nepoch not divisible by 20
    res = solver.train(nepoch=37, verbose=False)
    assert len(res.log["err_list"]) > 0
