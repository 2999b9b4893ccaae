"""Staged mixture growth (staged_q — round-4 VERDICT #4, lever 2).

Components are gated by weight on the device-side _epoch counter:
inactive components carry log-w - 60 (numerically absent), so the gated
mixture must match a truncated-Q solver exactly, activation must follow
the configured schedule, and the counter must advance through training.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gphm_tpu.models.solver_1d import Solver1D
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem
from gphm_tpu.utils.config import load_config

POLICY = Policy(dtype=jnp.float64, max_jitter_tries=0)
CFG = dict(Q=6, lr=0.01, llk_weight=100.0, logdet=True, tol=-1.0,
           freq_scale=10.0, jitter=1e-6)


def make(**kw):
    prob = make_problem("poisson_1d-single_sin", N_col=32, scale=2 * np.pi)
    return Solver1D(prob, "Matern52_Cos_1d", dict(CFG, **kw), POLICY)


def test_gate_follows_activation_schedule():
    s = make(staged_q_start=2, staged_q_epochs=100)
    p = s.init_params()
    assert "_epoch" in p
    base = np.asarray(p["kernel_paras"]["log-w"])
    for ep, n_on in [(0.0, 2), (25.0, 3), (50.0, 4), (99.0, 5), (100.0, 6),
                     (500.0, 6)]:
        kp = s._kp({**p, "_epoch": jnp.asarray(ep, jnp.float32)})
        lw = np.asarray(kp["log-w"]) - base
        assert np.allclose(lw[:n_on], 0.0), (ep, lw)
        assert np.allclose(lw[n_on:], -60.0), (ep, lw)


def test_gated_loss_equals_truncated_q():
    s = make(staged_q_start=2, staged_q_epochs=100)
    p = s.init_params()
    s2 = make(Q=2)
    p2 = s2.init_params()
    for k in ("log-w", "log-ls", "freq"):
        p2["kernel_paras"][k] = p["kernel_paras"][k][:2]
    l_gated = float(s.loss({**p, "_epoch": jnp.asarray(0.0, jnp.float32)}))
    l_trunc = float(s2.loss(p2))
    assert abs(l_gated - l_trunc) < 1e-6 * max(1.0, abs(l_trunc))


def test_staged_training_advances_counter_and_descends():
    s = make(staged_q_start=2, staged_q_epochs=100)
    res = s.train(200, verbose=False, mode="chunked")
    assert float(res.params["_epoch"]) == 200.0
    assert np.isfinite(res.min_err)
    # all components are active by ep100; the final state's gated kernel
    # params equal the raw ones (the gate is the identity from there on)
    kp = s._kp(res.params)
    np.testing.assert_array_equal(np.asarray(kp["log-w"]),
                                  np.asarray(res.params["kernel_paras"]
                                             ["log-w"]))


def test_staged_q_config_plumbing():
    cfg = load_config("poisson_1d-mix_sin", staged_q="8:0.4")
    sd = cfg.solver_dict()
    assert sd["staged_q_start"] == 8
    assert sd["staged_q_epochs"] == int(0.4 * cfg.nepoch)
    # staged-Q IS the shipped mix_sin default (campaign Q); off elsewhere
    assert load_config("poisson_1d-mix_sin").solver_dict()[
        "staged_q_start"] == 8
    assert load_config("poisson_1d-single_sin").solver_dict()[
        "staged_q_start"] == 0
    # the reference protocol strips it
    assert load_config("poisson_1d-mix_sin",
                       reference_protocol=True).solver_dict()[
        "staged_q_start"] == 0


def test_spectral_priority_order():
    from gphm_tpu.ops.kernels import spectral_freqs
    x = np.linspace(0.0, 1.0, 256)
    # two lines, 30 cycles strong + 10 cycles weak
    v = np.sin(2 * np.pi * 30 * x) + 0.2 * np.sin(2 * np.pi * 10 * x)
    f = spectral_freqs(x, v, 4, 40.0, priority_order=True)
    # strongest line first in priority order
    assert abs(f[0] - 30.0) < 0.5, f
    assert abs(f[1] - 10.0) < 0.5, f
