"""CPU probe: is the 2D Allen-Cahn GN-profiled stall solve-limited or
hyperparameter-limited? (round-3 VERDICT #4, the advection-probe
methodology applied to the AC engine.)

Round-4 measurement being explained: the MAP-profiled GN attack on
allencahn_2d-mix-sincos (N=400^2, refined tier, newton 6 / cg 100)
froze at rel-L2 0.296 from epoch 40 while the MAP loss kept descending
268M -> 44M over 260 epochs (result_log_r4ac1, archived). Two candidate
mechanisms:

  (a) SOLVE-limited: the damped Gauss-Newton + warm eigenbasis-PCG inner
      solve does not reach the conditional optimum U*(theta), so the
      envelope gradient and the error are wrong even though the
      hyperparameters are fine.
  (b) OBJECTIVE/hyperparameter-limited: U* is reached, but the MAP
      objective at the learned (and slowly-moving) hyperparameters has
      its optimum at ~0.3 error — loss descends by re-balancing prior
      magnitude terms, not by moving the solution.

The probe trains the same engine at a reduced grid (default N=64, CPU
f64) to its stall, then at the FINAL hyperparameters computes the exact
conditional optimum by dense damped Gauss-Newton on the (N^2 x N^2)
normal operator (every inner solve a direct dense solve, iterated to
gradient-norm convergence — no CG, no iteration cap). Comparing
rel-L2(engine GN iterate) vs rel-L2(exact U*) at identical
hyperparameters splits the error budget exactly as probe_adv_floor.py
does for advection. A third leg evaluates the exact U* at the spectral
INIT hyperparameters: if even that is ~stalled, no conditional-solve
improvement can help and the binding mechanism is the objective's
hyperparameter gradient.

A fourth leg runs at the PRODUCTION point itself, where the dense exact
solve is impossible (160,000^2): ``--from-checkpoint DIR`` loads the
archived run's rolling checkpoint (N=400 hyperparameters + engine
iterate V at the stall) and drives the engine's own GN/PCG inner solve
far past its training budget (several rounds of newton iterations at
boosted CG depth, warm-started from V). If the error does not move, the
inner solve is exonerated at the production point and the stall is the
MAP objective's own optimum.

Usage: python tools/probe_ac_floor.py [N] [nepoch] [newton] [cg]
       python tools/probe_ac_floor.py --from-checkpoint RUN_DIR [rounds]
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

_pos = [a for a in sys.argv[1:] if not a.startswith("--")] \
    if "--from-checkpoint" not in sys.argv else []
N = int(_pos[0]) if len(_pos) > 0 else 64
NEP = int(_pos[1]) if len(_pos) > 1 else 300
NEWTON = int(_pos[2]) if len(_pos) > 2 else 6
CG = int(_pos[3]) if len(_pos) > 3 else 100

cfg = dict(Q=30, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
           freq_scale=30.0, jitter=1e-6, u_mode="profiled",
           profile_objective="map", profile_cg_iters=CG,
           profile_newton_iters=NEWTON, freq_init="spectral",
           lr_decay=0.1, lr_decay_steps=NEP)


def make_solver():
    prob = make_problem("allencahn_2d-mix-sincos", N_col=N, scale=1.0)
    return Solver2D(prob, "Matern52_Cos_1d", dict(cfg),
                    Policy(dtype=jnp.float64, max_jitter_tries=0))


def exact_u_star(solver, params, iters=60, tol=1e-8):
    """Dense damped Gauss-Newton to convergence at fixed hyperparameters.

    Minimizes, over u = vec(U) (Fortran order, U is N1 x N2):
      F(u) = 0.5 u^T (K2 (x) K1)^{-1} u
           + 0.5 v ||L u + u^3 - u - src||^2
           + 0.5 wt (u - 2b)^T Mask u + const
    with L = D2 (x) I + I (x) D1, D = Kd K^{-1} (the derivative lift the
    solver itself uses, solver_2d._u_star). Every GN step solves the
    dense normal system directly; a backtracking line search on F makes
    the iteration monotone. Returns U* as a grid.
    """
    tau = float(jnp.exp(params["log_tau"]))
    v = float(jnp.exp(params["log_v"]))
    wt = float(solver.llk_weight) * tau
    K1, Kd1 = solver._K_and_Kd(solver.x_col, solver.axis1,
                               params["kernel_paras_1"])
    K2, Kd2 = solver._K_and_Kd(solver.y_col, solver.axis2,
                               params["kernel_paras_2"])
    K1, Kd1, K2, Kd2 = (np.asarray(a, np.float64)
                        for a in (K1, Kd1, K2, Kd2))
    n1, n2 = K1.shape[0], K2.shape[0]
    D1 = np.linalg.solve(K1.T, Kd1.T).T          # Kd1 K1^{-1}
    D2 = np.linalg.solve(K2.T, Kd2.T).T
    I1, I2 = np.eye(n1), np.eye(n2)
    L = np.kron(D2, I1) + np.kron(I2, D1)
    # K1/K2 already carry the solver's per-axis jitter (_K_and_Kd);
    # no extra ridge, so F matches the engine's conditional objective.
    P = np.linalg.inv(np.kron(K2, K1))
    mask = np.asarray(solver._bc_mask, np.float64).reshape(-1, order="F")
    bgrid = np.asarray(solver._bc_grid, np.float64).reshape(-1, order="F")
    src = np.asarray(solver.src_loss, np.float64).reshape(-1, order="F")

    # start from the ENGINE's iterate (warm): measures pure headroom
    V = np.asarray(params["U"], np.float64)
    u = (K1 @ V @ K2).reshape(-1, order="F")

    def F(u):
        r = L @ u + u ** 3 - u - src
        return (0.5 * u @ (P @ u) + 0.5 * v * (r @ r)
                + 0.5 * wt * ((u - 2.0 * bgrid) * mask) @ u)

    f = F(u)
    for it in range(iters):
        r = L @ u + u ** 3 - u - src
        Jdiag = 3.0 * u ** 2 - 1.0
        J = L + np.diag(Jdiag)
        g = P @ u + v * (J.T @ r) + wt * mask * (u - bgrid)
        gn = float(np.linalg.norm(g) / max(1.0, np.linalg.norm(u)))
        if gn < tol:
            break
        H = P + v * (J.T @ J) + wt * np.diag(mask)
        step = np.linalg.solve(H, g)
        eta, f_new = 1.0, None
        for _ in range(20):
            cand = F(u - eta * step)
            if cand < f:
                f_new = cand
                break
            eta *= 0.5
        if f_new is None:
            break
        u, f = u - eta * step, f_new
    return u.reshape(n1, n2, order="F"), f, it, gn


def eval_err_for_U(solver, params, U):
    """rel-L2 of the solver's own prediction path with latent U."""
    K1, _ = solver._K_and_Kd(solver.x_col, solver.axis1,
                             params["kernel_paras_1"])
    K2, _ = solver._K_and_Kd(solver.y_col, solver.axis2,
                             params["kernel_paras_2"])
    V = np.linalg.solve(np.asarray(K1, np.float64), np.asarray(U))
    V = np.linalg.solve(np.asarray(K2, np.float64).T, V.T).T
    p = dict(params, U=jnp.asarray(V))
    return float(solver._eval_err(p))


def checkpoint_leg(run_dir: str, rounds: int = 8):
    """Drive the engine's GN inner solve past its budget at the archived
    production stall point (see module docstring)."""
    import dataclasses

    from gphm_tpu.experiment import make_solver
    from gphm_tpu.utils.checkpoint import load_checkpoint, load_meta
    from gphm_tpu.utils.config import RunConfig

    latest = f"{run_dir}/latest.npz"
    meta = load_meta(latest)["meta"]
    config = RunConfig(**{k: v for k, v in meta.items()
                          if k in RunConfig.__dataclass_fields__})
    # CPU f64 exact tier, boosted inner solve: 2x newton per round, 4x CG
    config = dataclasses.replace(config, dtype="float64",
                                 profile_newton_iters=2 * config.
                                 profile_newton_iters,
                                 profile_cg_iters=4 * config.
                                 profile_cg_iters)
    solver = make_solver(config)
    tmpl_p = solver.init_params()
    tmpl = (tmpl_p, solver.optimizer.init(tmpl_p))
    params, _ = load_checkpoint(latest, tmpl)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    e0 = float(solver._eval_err(params))
    print(f"[ckpt] epoch {meta['epoch']} engine iterate: rel-L2 {e0:.6g} "
          f"(recorded min {meta.get('min_err')})")
    for rnd in range(rounds):
        t0 = time.time()
        V = solver._u_star(params)
        params = dict(params, U=V)
        e = float(solver._eval_err(params))
        print(f"[ckpt] +{(rnd + 1) * config.profile_newton_iters} GN its "
              f"(cg {config.profile_cg_iters}): rel-L2 {e:.6g} "
              f"({time.time() - t0:.0f}s)")
    moved = abs(e - e0) / max(e0, 1e-30)
    print(f"[ckpt verdict] error moved {100 * moved:.2f}% after "
          f"{rounds * config.profile_newton_iters} extra GN iterations -> "
          + ("SOLVE-limited at the production point" if moved > 0.2 else
             "inner solve exonerated at the production point: the stall "
             "is the MAP objective's optimum at these hyperparameters"))


def main():
    if "--from-checkpoint" in sys.argv:
        i = sys.argv.index("--from-checkpoint")
        run_dir = sys.argv[i + 1]
        rounds = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 8
        checkpoint_leg(run_dir, rounds)
        return
    print(f"probe_ac_floor: N={N} nepoch={NEP} newton={NEWTON} cg={CG}")
    solver = make_solver()
    t0 = time.time()
    res = solver.train(NEP, verbose=False, mode="chunked")
    errs = np.asarray(res.log["err_list"])
    print(f"[train] {NEP} ep in {time.time() - t0:.0f}s; "
          f"err trajectory {np.round(errs[:: max(1, len(errs) // 8)], 4)} "
          f"min {res.min_err:.4g}")
    params = {k: jnp.asarray(v) if not isinstance(v, dict) else
              {kk: jnp.asarray(vv) for kk, vv in v.items()}
              for k, v in res.params.items()}

    e_engine = float(solver._eval_err(params))
    print(f"[engine] rel-L2 at final params (GN{NEWTON}/cg{CG} iterate): "
          f"{e_engine:.4g}")

    t0 = time.time()
    Ustar, f, its, gn = exact_u_star(solver, params)
    e_exact = eval_err_for_U(solver, params, Ustar)
    print(f"[exact @final] dense GN converged in {its} its "
          f"(grad norm {gn:.2e}, {time.time() - t0:.0f}s): "
          f"rel-L2 {e_exact:.4g}")

    # leg 3: exact conditional optimum at the spectral-init hypers
    init = solver.init_params()
    init_p = {k: jnp.asarray(v) if not isinstance(v, dict) else
              {kk: jnp.asarray(vv) for kk, vv in v.items()}
              for k, v in init.items()}
    Ustar0, _, its0, gn0 = exact_u_star(solver, init_p)
    e_exact0 = eval_err_for_U(solver, init_p, Ustar0)
    print(f"[exact @init]  dense GN ({its0} its, grad {gn0:.2e}): "
          f"rel-L2 {e_exact0:.4g}")

    ratio = e_engine / max(e_exact, 1e-30)
    verdict = ("SOLVE-limited (exact conditional optimum is much better "
               "than the engine iterate)" if ratio > 3 else
               "OBJECTIVE/hyperparameter-limited (the engine already sits "
               "at the conditional optimum; the MAP objective's optimum "
               "at these hyperparameters IS the stall)")
    print(f"[verdict] engine/exact = {ratio:.2f} -> {verdict}")


if __name__ == "__main__":
    main()
