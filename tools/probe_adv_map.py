"""CPU probe: can the MAP-profiled advection cliff be survived?

Campaign H (round 2) and the round-3 adv_map probe both show the
MAP-profiled engine on advection converging fast (7.98e-3 at ~epoch 300 on
the N=96 reduction) and then blowing up into NaN with nan_policy="warn".
The rollback policy (restore last finite state + fresh Adam moments) was
never tried on this config; neither was a larger PCG budget (cg200 cut the
marginal engine's plateau 0.34 -> 0.08 on the same reduction).

This probe trains MAP-profiled advection with nan_policy="rollback",
optional cosine lr decay, and a configurable CG budget, and reports the
error trajectory + the running min.

Usage: python tools/probe_adv_map.py [N] [nepoch] [cg] [lr_decay]
(runs on CPU: this environment's sitecustomize pre-imports jax with the
TPU plugin, so JAX_PLATFORMS in the shell is too late — the platform is
forced via jax.config below, as tests/conftest.py does.)
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gphm_tpu.models.solver_2d import Solver2D
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem

N = int(sys.argv[1]) if len(sys.argv) > 1 else 96
NEP = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
CG = int(sys.argv[3]) if len(sys.argv) > 3 else 200
DECAY = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
EQ = sys.argv[5] if len(sys.argv) > 5 else "advection-sin"

EQ_CFG = {
    "advection-sin": dict(llk_weight=500.0, freq_scale=40.0, scale=1.0,
                          beta=200.0),
    "poisson_2d-sin_sin": dict(llk_weight=200.0, freq_scale=20.0,
                               scale=2 * np.pi, beta=1.0),
}[EQ]
cfg = dict(Q=30, lr=0.01, llk_weight=EQ_CFG["llk_weight"], logdet=True,
           tol=-1.0, freq_scale=EQ_CFG["freq_scale"], jitter=1e-6,
           u_mode="profiled", profile_cg_iters=CG, freq_init="spectral",
           beta=EQ_CFG["beta"], profile_objective="map", lr_decay=DECAY)
prob = make_problem(EQ, N_col=N, scale=EQ_CFG["scale"])
solver = Solver2D(prob, "Matern52_Cos_1d", cfg, Policy(jnp.float64))

t0 = time.time()
res = solver.train(NEP, verbose=False, mode="chunked", n_evals=15,
                   nan_policy="rollback")
errs = np.asarray(res.log["err_list"])
print(f"{EQ} N={N} nepoch={NEP} cg={CG} decay={DECAY} wall={time.time() - t0:.0f}s")
print("errs:", [f"{e:.3e}" for e in errs])
print(f"min rel-L2 = {np.nanmin(errs):.4e}")
