"""Shipped-default protocol plumbing (round-3 VERDICT #2).

The YAML configs encode the campaign-proven headline protocols (PARITY
"shipped default" column); ``--reference-protocol`` restores the faithful
reference runs. These tests pin the whole chain: YAML -> RunConfig ->
make_solver -> solver attributes, for every shipped equation, in both modes.
"""

import dataclasses

import jax.numpy as jnp
import pytest

from gphm_tpu.experiment import _policy_for, make_solver
from gphm_tpu.utils.config import (EQUATIONS_1D, EQUATIONS_2D,
                                   EQUATIONS_ADVECTION, REFERENCE_RESET,
                                   load_config)

ALL_EQUATIONS = EQUATIONS_1D + EQUATIONS_2D + EQUATIONS_ADVECTION

# the headline protocol each YAML must encode: (field -> expected value)
SHIPPED = {
    "poisson_1d-single_sin": dict(dtype="refined", u_mode="profiled",
                                  lr_decay=0.05, nepoch=6000),
    "poisson_1d-sin_cos": dict(dtype="refined", u_mode="profiled",
                               lr_decay=0.05, nepoch=6000),
    "poisson_1d-x_time_sinx": dict(dtype="refined", u_mode="profiled",
                                   freq_init="spectral", lr_decay=0.05,
                                   nepoch=10000),
    "poisson_1d-x2_add_sinx": dict(dtype="refined", u_mode="profiled",
                                   freq_init="spectral", mean_poly=2,
                                   nepoch=20000, kernel_extra=None),
    "poisson_1d-mix_sin": dict(dtype="refined", u_mode="profiled",
                               kernel_extra="Matern52_1d",
                               profile_objective="map", change_point=0.5,
                               staged_q="8:0.4", freq_init="spectral"),
    "allencahn_1d-single_sin": dict(dtype="float32", u_mode="adam",
                                    nepoch=100000),
    "allencahn_1d-sin_cos": dict(dtype="float32", u_mode="adam",
                                 nepoch=100000),
    "poisson_2d-sin_sin": dict(dtype="float32", u_mode="adam",
                               nepoch=100000),
    "poisson_2d-sin_add_cos": dict(dtype="float32", nepoch=1000000),
    "poisson_2d-sin_cos": dict(dtype="float32", nepoch=1000000),
    "allencahn_2d-mix-sincos": dict(dtype="float32", jitter=1e-5),
    # MAP hedge shipped by campaign W (0.0221 @ 1500 vs the marginal
    # default's 0.0797 @ 3000 — the surrogate-biased marginal ascent,
    # tools/probe_occam2d.py); dense eval cadence keeps the profiled
    # chunks short (a 150-epoch chunk at N=400 trips the device launch
    # watchdog, campaign U crash post-mortem)
    "poisson_2d-x2y2_add_sinsin": dict(dtype="refined", u_mode="profiled",
                                       profile_objective="map",
                                       freq_init="spectral", mean_poly=2,
                                       profile_cg_iters=100, lr_decay=0.1,
                                       n_evals=75, nepoch=1500),
    "advection-sin": dict(dtype="refined", u_mode="profiled",
                          profile_objective="map", freq_init="spectral",
                          profile_cg_iters=200, jitter=1e-6, lr_decay=0.1,
                          nepoch=4000, n_evals=80),
}

# reference budgets/values restored by --reference-protocol
# (reference: code/config/*.yaml nepoch lines; code/model_GP_solver_1d.py:365
# jitter; code/run_1d.sh / run_2d.sh budgets are CLI-side)
REFERENCE_VALUES = {
    "poisson_1d-single_sin": dict(nepoch=100000),
    "poisson_1d-sin_cos": dict(nepoch=100000),
    "poisson_1d-x_time_sinx": dict(nepoch=100000),
    "poisson_1d-x2_add_sinx": dict(nepoch=1000000, change_point=0.01),
    "poisson_1d-mix_sin": dict(nepoch=1000000, change_point=0.5),
    "allencahn_2d-mix-sincos": dict(jitter=1e-6, nepoch=3000000),
    "poisson_2d-sin_sin": dict(nepoch=1000000),
    # the reference's own budget, run_2d.sh:29 (ADVICE round 3: the
    # earlier 2e5 override measured reference-protocol parity at the
    # wrong budget)
    "advection-sin": dict(nepoch=1000000),
}


@pytest.mark.parametrize("equation", ALL_EQUATIONS)
def test_shipped_yaml_encodes_headline_protocol(equation):
    cfg = load_config(equation)
    for field, want in SHIPPED[equation].items():
        assert getattr(cfg, field) == want, (
            f"{equation}: YAML ships {field}={getattr(cfg, field)!r}, "
            f"headline protocol needs {want!r}")


@pytest.mark.parametrize("equation", ALL_EQUATIONS)
def test_reference_protocol_restores_reference_run(equation):
    cfg = load_config(equation, reference_protocol=True)
    # every extension field is back at its reference semantics
    for field, want in REFERENCE_RESET.items():
        assert getattr(cfg, field) == want, (field, getattr(cfg, field))
    # per-config reference values (budgets, jitter) are restored
    for field, want in REFERENCE_VALUES.get(equation, {}).items():
        assert getattr(cfg, field) == want, (field, getattr(cfg, field))
    # reference hyperparameters are untouched by the shipped defaults
    shipped = load_config(equation)
    for field in ("Q", "lr", "llk_weight", "freq_scale", "N_col", "scale",
                  "logdet"):
        assert getattr(cfg, field) == getattr(shipped, field), field
    # explicit overrides still win on top of the reset
    assert load_config(equation, reference_protocol=True, Q=7).Q == 7


@pytest.mark.parametrize("equation", ALL_EQUATIONS)
def test_yaml_to_solver_plumbing(equation):
    """The solver object actually receives the shipped protocol (small
    N_col: the protocol plumbing is N-independent)."""
    cfg = load_config(equation, N_col=24)
    solver = make_solver(cfg)
    assert solver.u_mode == cfg.u_mode
    if cfg.u_mode == "profiled":
        assert solver.whitened
        assert solver.profile_objective == cfg.profile_objective
        assert solver.wide_train  # refined tier end to end
    if cfg.family in ("1d", "1d_extra"):
        assert solver.n_beta == (cfg.mean_poly + 1 if cfg.mean_poly >= 0
                                 else 0)
    assert solver.jitter == cfg.jitter
    pol = _policy_for(cfg)
    if cfg.dtype == "refined":
        assert pol.dtype == jnp.float32 and pol.refine_iters > 0
    else:
        assert pol.dtype == jnp.dtype(cfg.dtype) and not pol.refine_iters
    # spectral init actually moves the frequency leaves off linspace
    if cfg.freq_init == "spectral" and cfg.family == "1d":
        import numpy as np
        ref = make_solver(dataclasses.replace(cfg, freq_init="linspace"))
        f_spec = np.asarray(solver.init_params()["kernel_paras"]["freq"])
        f_lin = np.asarray(ref.init_params()["kernel_paras"]["freq"])
        assert not np.allclose(f_spec, f_lin)


def test_phase_exact_resolution():
    from gphm_tpu.ops.gram import resolve_phase_exact
    assert resolve_phase_exact("auto") is False
    assert resolve_phase_exact("on") is True
    assert resolve_phase_exact("off") is False
    assert resolve_phase_exact(True) is True
    with pytest.raises(ValueError):
        resolve_phase_exact("maybe")
    # and through the solver: 'on' flips the training tau to a TwoFloat
    cfg = load_config("poisson_1d-single_sin", reference_protocol=True,
                      N_col=24, phase_exact="on")
    s_on = make_solver(cfg)
    cfg_off = load_config("poisson_1d-single_sin", reference_protocol=True,
                          N_col=24)
    s_off = make_solver(cfg_off)
    from gphm_tpu.ops.df32 import TwoFloat
    assert isinstance(s_on.axis.tau_train, TwoFloat)
    assert not isinstance(s_off.axis.tau_train, TwoFloat)


def test_occam_ramp_and_schedule_are_exclusive():
    import pytest

    from gphm_tpu.utils.config import load_config
    with pytest.raises(ValueError, match="alternative tempering"):
        load_config("poisson_1d-single_sin", occam_ramp=0.3,
                    occam_schedule="0:0.5,1:0.5")
