"""TPU probe: profiled-2D step cost + short-run accuracy at production size.

Measures (a) compile + per-step wall of the profiled Solver2D step at
N=400 (eigh-in-scan + 60-iteration f64 PCG is the risk), (b) a short
training run's rel-L2 trajectory on poisson_2d-sin_add_cos.

Usage:  python tools/probe_profiled_2d_tpu.py [N] [nepoch] [equation]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from gphm_tpu.models.solver_2d import Solver2D
from gphm_tpu.precision import Policy
from gphm_tpu.problems.equations import make_problem

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400
NEP = int(sys.argv[2]) if len(sys.argv) > 2 else 400
EQ = sys.argv[3] if len(sys.argv) > 3 else "poisson_2d-sin_add_cos"

jax.config.update("jax_enable_x64", True)

policy = (Policy(dtype=jnp.float32, refine_iters=8, refine_logdet_iters=4)
          if jax.default_backend() != "cpu"
          else Policy(dtype=jnp.float64))
cfg = dict(Q=30, lr=0.01, llk_weight=100.0, logdet=True, tol=-1.0,
           freq_scale=20.0, jitter=1e-6, u_mode="profiled",
           profile_cg_iters=60)
prob = make_problem(EQ, N_col=N, scale=2 * np.pi)
solver = Solver2D(prob, "Matern52_Cos_1d", cfg, policy)

t0 = time.time()
res = solver.train(NEP, verbose=False, mode="chunked", n_evals=10)
wall = time.time() - t0
print(f"N={N} nepoch={NEP} eq={EQ} backend={jax.default_backend()}")
print("err_list:", [f"{e:.3e}" for e in np.asarray(res.log["err_list"])])
print(f"min_err={res.min_err:.4e} wall={wall:.1f}s "
      f"({1e3 * wall / NEP:.2f} ms/epoch incl compile)")
