"""Is the 2D marginal ascent surrogate-limited? (round-3 VERDICT #2)

Every documented 2D marginal-profiled failure (sin_sin plateau 0.175,
x2y2 0.08) was *attributed* to "the marginal ascent loses the
hyperparameters" — exactly the symptom a biased evidence gradient would
produce, and the separable Occam surrogate (ops/kron_profile.
occam_logdet_2d) drops the cross-axis data-term coupling by construction.
This probe isolates the mechanism at a grid small enough for the exact
dense logdet S (ops/kron_profile.occam_logdet_2d_exact, pinned to the
brute-force Gaussian integral by tests/test_occam2d.py):

  Leg A (gradient bias along a real trajectory): train sin_sin at N=48,
    scale 1 — 3 collocation points per source cycle, matching the
    production 400^2/scale-2pi density — with the SURROGATE objective,
    and at checkpoints compare surrogate vs exact Occam gradients
    (per-group relative error + cosine), plus the full-objective gradient
    cosine (the bias diluted by the exact likelihood terms).

  Leg B (outcome A/B): identical runs with occam_2d='exact' vs
    'separable' — if the surrogate is the binding failure, the exact
    objective must descend measurably further.

  Leg C: the same A/B on x2y2_add_sinsin (trend-augmented: the exact path
    additionally carries the V-beta coupling block).

Findings go to PARITY.md (campaign Y). Usage:
    python tools/probe_occam2d.py [--fast]
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gphm_tpu.models.solver_2d import Solver2D  # noqa: E402
from gphm_tpu.ops.kron_profile import (  # noqa: E402
    occam_logdet_2d, occam_logdet_2d_exact)
from gphm_tpu.precision import Policy  # noqa: E402
from gphm_tpu.problems.equations import make_problem  # noqa: E402

FAST = "--fast" in sys.argv
N = 32 if FAST else 48
EPOCHS = [100, 200] if FAST else [150, 300, 600, 1200]
POLICY = Policy(dtype=jnp.float64, max_jitter_tries=0)
CFG = dict(Q=30, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
           freq_scale=20.0, jitter=1e-6, u_mode="profiled",
           profile_objective="marginal", profile_cg_iters=100,
           freq_init="spectral", lr_decay=0.1,
           lr_decay_steps=EPOCHS[-1])


def make(equation, **kw):
    prob = make_problem(equation, N_col=N, scale=1.0)
    return Solver2D(prob, "Matern52_Cos_1d", dict(CFG, **kw), POLICY)


def occ_grads(solver, p):
    """(value, grad-vector, per-group dict) for surrogate and exact."""
    def run(fn):
        def f(params):
            K1, Kd1 = solver._K_and_Kd(solver.x_col, solver.axis1,
                                       params["kernel_paras_1"])
            K2, Kd2 = solver._K_and_Kd(solver.y_col, solver.axis2,
                                       params["kernel_paras_2"])
            wt = solver.llk_weight * jnp.exp(params["log_tau"])
            v = jnp.exp(params["log_v"])
            a1 = jnp.asarray(1.0, K1.dtype)
            if fn is occam_logdet_2d:
                return fn(K1, Kd1, K2, Kd2, a1, wt, v)
            return fn(K1, Kd1, K2, Kd2, solver._bc_mask, a1, wt, v)
        val, g = jax.value_and_grad(f)(p)
        groups = {"log_tau": jnp.atleast_1d(g["log_tau"]),
                  "log_v": jnp.atleast_1d(g["log_v"])}
        for ax in ("kernel_paras_1", "kernel_paras_2"):
            for leaf in sorted(g[ax]):
                groups[f"{ax[-1]}:{leaf}"] = g[ax][leaf].reshape(-1)
        return float(val), groups
    return run(occam_logdet_2d), run(occam_logdet_2d_exact)


def report_bias(solver, p, tag):
    (vs, gs), (ve, ge) = occ_grads(solver, p)
    print(f"  [{tag}] occ value: surrogate {vs:.4f} exact {ve:.4f} "
          f"(diff {vs - ve:+.4f})")
    flat_s = jnp.concatenate(list(gs.values()))
    flat_e = jnp.concatenate(list(ge.values()))
    cos = float(jnp.vdot(flat_s, flat_e)
                / (jnp.linalg.norm(flat_s) * jnp.linalg.norm(flat_e) + 1e-300))
    print(f"  [{tag}] occ-grad cosine(all) {cos:.4f}  "
          f"|gs|/|ge| {float(jnp.linalg.norm(flat_s) / (jnp.linalg.norm(flat_e) + 1e-300)):.3f}")
    for k in gs:
        a, b = gs[k], ge[k]
        nb = float(jnp.linalg.norm(b))
        rel = float(jnp.linalg.norm(a - b)) / (nb + 1e-300)
        ck = float(jnp.vdot(a, b)) / (float(jnp.linalg.norm(a)) * nb + 1e-300)
        print(f"    {k:10s} relerr {rel:8.3f} cos {ck:+.3f} |exact| {nb:.3e}")
    # full-objective gradient: bias diluted by the exact terms
    sol_e = make(solver.problem.equation, occam_2d="exact",
                 mean_poly=solver.config.get("mean_poly", -1))

    def full(sol, params):
        U = jax.lax.stop_gradient(sol._u_star(params))
        if sol.n_beta:
            V, beta = U
            return sol._loss({**params, "U": V, "beta": beta})
        return sol._loss({**params, "U": U})

    gf_s = jax.grad(lambda q: full(solver, q))(p)
    gf_e = jax.grad(lambda q: full(sol_e, q))(p)
    leaves_s = jnp.concatenate([x.reshape(-1) for x in
                                jax.tree_util.tree_leaves(gf_s)])
    leaves_e = jnp.concatenate([x.reshape(-1) for x in
                                jax.tree_util.tree_leaves(gf_e)])
    cosf = float(jnp.vdot(leaves_s, leaves_e)
                 / (jnp.linalg.norm(leaves_s) * jnp.linalg.norm(leaves_e)
                    + 1e-300))
    print(f"  [{tag}] FULL-objective grad cosine {cosf:.4f}")


def run_leg(equation, occam, **kw):
    sol = make(equation, occam_2d=occam, **kw)
    state, last = None, 0
    errs = []
    t0 = time.time()
    for e in EPOCHS:
        res = sol.train(e, verbose=False, mode="chunked", init_state=state,
                        start_epoch=last, n_evals=max(2, (e - last) // 25))
        state = (res.params, res.opt_state)
        last = e
        errs.append((e, res.min_err, res.log["err_list"][-1]))
    dt = time.time() - t0
    return sol, state, errs, dt


def _arg(flag, default):
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


def ab(equation, arms=("separable", "slq", "exact"), **kw):
    """Outcome A/B: separable surrogate vs the production SLQ correction
    (round 5: control-variated gradient, ops/kron_profile cv=True) vs the
    exact dense logdet S — identical protocols. The separable/exact ratio
    answers 'is the marginal ascent surrogate-limited'; the slq/exact
    ratio answers 'does the production correction recover the exact
    outcome' at a grid where the exact term is computable."""
    print(f"\n=== A/B on {equation} (N={N}, scale 1, arms={arms}) ===",
          flush=True)
    results = {}
    for occam in arms:
        sol, st, errs, dt = run_leg(equation, occam, **kw)
        results[occam] = errs
        print(f"  {occam:9s}: {dt:.0f}s  " + "  ".join(
            f"ep{e}: min {m:.3e} last {l:.3e}" for e, m, l in errs),
            flush=True)
    if "separable" in results and "exact" in results:
        ratio = results["separable"][-1][1] / max(results["exact"][-1][1],
                                                  1e-300)
        print(f"  min-err ratio separable/exact at ep{EPOCHS[-1]}: "
              f"{ratio:.2f} "
              f"({'surrogate-limited' if ratio > 2 else 'NOT surrogate-limited'} "
              f"at this scale)")
    if "slq" in results and "exact" in results:
        rs = results["slq"][-1][1] / max(results["exact"][-1][1], 1e-300)
        print(f"  slq/exact: {rs:.2f}")


def main():
    arms = tuple(_arg("--arms", "separable,slq,exact").split(","))
    eqs = _arg("--eq", "poisson_2d-sin_sin,poisson_2d-x2y2_add_sinsin")
    print(f"probe_occam2d: N={N} epochs={EPOCHS} fast={FAST} arms={arms} "
          f"eq={eqs}", flush=True)
    if "--ab-only" not in sys.argv:
        print("\n=== Leg A: gradient bias along the surrogate trajectory "
              "(sin_sin) ===")
        sol = make("poisson_2d-sin_sin")
        p = sol.init_params()
        report_bias(sol, p, "init")
        state, last = None, 0
        for e in EPOCHS:
            res = sol.train(e, verbose=False, mode="chunked",
                            init_state=state, start_epoch=last,
                            n_evals=max(2, (e - last) // 25))
            state = (res.params, res.opt_state)
            last = e
            print(f"  trained to ep{e}: min_err {res.min_err:.3e}")
            report_bias(sol, res.params, f"ep{e}")

    for eq in eqs.split(","):
        kw = {"mean_poly": 2} if eq == "poisson_2d-x2y2_add_sinsin" else {}
        if eq.startswith("allencahn"):
            # the GN profiled engine's production knobs (campaign AC)
            kw = {"profile_newton_iters": 6}
        ab(eq, arms=arms, **kw)


if __name__ == "__main__":
    main()
