"""CPU probe: is the 2D profiled plateau an ASCENT pathology or an INIT
floor?

Campaign U left one mechanism unpinned (PARITY "Why the N=128 CPU probe
escapes it is not pinned down"): profiled-marginal poisson_2d reaches
2.2e-3 at N=128 but plateaus at 0.08-0.18 at the production N=400. Two
hypotheses:

  (a) init floor — at N=400 the spectral-init hyperparameters already
      give a bad conditional optimum U*(theta_init), so no ascent could
      help;
  (b) ascent walk-away — U*(theta_init) is good at every N, but the
      marginal ascent moves the hyperparameters (frequencies) away from
      the data lines at N=400 (same mechanism as 1D campaign I2).

This probe separates them by computing rel-L2(U*(theta)) with a large CG
budget at (1) the spectral INIT parameters and (2) optionally the
parameters after a short marginal ascent, reporting the per-axis
frequency drift of the top-weight mixture components.

Usage: python tools/probe_2d_init_floor.py [N ...] [--train N NEP]
Reference objective under probe: /root/reference/code/model_GP_solver_2d.py
(the MAP/marginal 2D Poisson loss this engine profiles).
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

EQ = "poisson_2d-sin_sin"
ITERS = 1500  # CG budget for the "exact" conditional optimum


def build(N, cg=ITERS):
    cfg = dict(Q=30, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
               freq_scale=20.0, jitter=1e-6, u_mode="profiled",
               profile_cg_iters=cg, freq_init="spectral")
    prob = make_problem(EQ, N_col=N, scale=2 * np.pi)
    return Solver2D(prob, "Matern52_Cos_1d", cfg, Policy(jnp.float64))


def floor_at(solver, params):
    """rel-L2 of the conditional optimum U*(theta) at these params."""
    out = solver._u_star(params)
    V = out[0] if isinstance(out, tuple) else out
    p = dict(params)
    p["U"] = V
    return float(solver.eval_err(p)), V


def top_freqs(params, k=4):
    out = []
    for leaf in ("kernel_paras_1", "kernel_paras_2"):
        kp = params[leaf]
        w = np.exp(np.asarray(kp["log-w"]).reshape(-1))
        f = np.asarray(kp["freq"]).reshape(-1)
        idx = np.argsort(-w)[:k]
        out.append([(float(f[i]), float(w[i] / w.sum())) for i in idx])
    return out


def main():
    args = sys.argv[1:]
    train_n = train_ep = None
    if "--train" in args:
        i = args.index("--train")
        train_n, train_ep = int(args[i + 1]), int(args[i + 2])
        args = args[:i]
    Ns = [int(a) for a in args] or [128, 256, 400]

    for N in Ns:
        solver = build(N)
        params = solver.init_params()
        t0 = time.time()
        err, _ = floor_at(solver, params)
        print(f"N={N:4d}  init-floor rel-L2(U*(theta_init)) = {err:.4e}  "
              f"({time.time() - t0:.0f}s, cg={ITERS})")
        print(f"         init top freqs: {top_freqs(params)}")

    if train_n is None:
        return
    N, NEP = train_n, train_ep
    solver = build(N, cg=100)  # production-like CG budget for ascent
    p0 = solver.init_params()
    f0 = top_freqs(p0)
    t0 = time.time()
    res = solver.train(NEP, verbose=False, mode="chunked",
                       n_evals=max(6, NEP // 100))
    errs = np.asarray(res.log["err_list"])
    print(f"\nN={N} marginal ascent {NEP} ep ({time.time() - t0:.0f}s): "
          f"err min={errs.min():.3e} last={errs[-1]:.3e}")
    print("trajectory:", [f"{e:.2e}" for e in errs[:: max(1, len(errs) // 10)]])
    ft = top_freqs(res.params)
    print(f"init    top freqs: {f0}")
    print(f"learned top freqs: {ft}")
    solver.profile_cg_iters = ITERS
    err, _ = floor_at(solver, res.params)
    print(f"floor at learned params (cg={ITERS}): {err:.4e}")


if __name__ == "__main__":
    main()
