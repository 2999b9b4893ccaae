"""CPU probe: can profiled sin_sin win from WARM hyperparameters?

poisson_2d-sin_sin is the one config where the profiled engine loses to
adam (0.175 vs 1.5e-3, campaigns H/W context). Resolution audit: with
scale=2pi the solution sin(100x)sin(100y) has 100 cycles across the
domain — N_col=400 is 4 points/cycle (the same marginal-resolution
regime as 1D x2_add_sinx at N=400), and any CPU reduction below N~300
is sub-Nyquist, which invalidates naive reduced-N probes (the N=128
probes in /tmp/sinsin_*_cpu.log alias the solution entirely).

So this probe stays at production N=400 (CPU f64) and asks where the
profiled CONDITIONAL OPTIMUM U*(theta) is good:

  leg A — adam warmup: train the reference-protocol adam engine for
          ``nep_adam`` epochs, then compute U*(theta_adam) with a large
          CG budget. If rel-L2(U*) << rel-L2(adam @ warmup) the hybrid
          "short adam -> profiled" protocol (r2 VERDICT #3's suggestion)
          wins without any marginal ascent.
  leg B — oracle theta: spectral line placed EXACTLY at 100/(2pi) with
          dominant weight, small (tau, v) grid scan. Upper bound on any
          hyperparameter-ascent scheme.
  leg C — spectral-init theta at N=400 (what `--freq-init spectral`
          actually produces here), same scan. If B works but C doesn't,
          the 4-pts/cycle periodogram is what misses the line.

Usage: python tools/probe_sinsin_hybrid.py [legs=ABC] [nep_adam=10000]
Reference objective: /root/reference/code/model_GP_solver_2d.py.
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

LEGS = sys.argv[1] if len(sys.argv) > 1 else "ABC"
NEP_ADAM = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
N = 400
ITERS = 1500
F_TRUE = 100.0 / (2.0 * np.pi)  # kernel cos(2 pi f tau) line of sin(100 x)


def build(u_mode, freq_init="linspace", cg=ITERS):
    cfg = dict(Q=30, lr=0.01, llk_weight=200.0, logdet=True, tol=-1.0,
               freq_scale=20.0, jitter=1e-6, freq_init=freq_init)
    if u_mode == "profiled":
        cfg.update(u_mode="profiled", profile_cg_iters=cg)
    prob = make_problem("poisson_2d-sin_sin", N_col=N, scale=2 * np.pi)
    return Solver2D(prob, "Matern52_Cos_1d", cfg, Policy(jnp.float64))


def floor_at(solver, theta, tag):
    """rel-L2 of U*(theta) — theta = dict with kernel_paras_{1,2},
    log_tau, log_v; the latent leaf is zeroed (cold CG start)."""
    p = dict(solver.init_params())
    for k in ("kernel_paras_1", "kernel_paras_2", "log_tau", "log_v"):
        p[k] = theta[k]
    p["U"] = jnp.zeros_like(p["U"])
    t0 = time.time()
    V = solver._u_star(p)
    V = V[0] if isinstance(V, tuple) else V
    q = dict(p)
    q["U"] = V
    err = float(solver.eval_err(q))
    print(f"  [{tag}] rel-L2(U*) = {err:.4e}  ({time.time() - t0:.0f}s)")
    return err


def scan_tau_v(solver, theta, tag):
    best = (np.inf, None)
    base_t, base_v = float(theta["log_tau"]), float(theta["log_v"])
    for dt in (0.0, np.log(1e3), np.log(1e6)):
        for dv in (0.0, np.log(1e3), np.log(1e6)):
            th = dict(theta)
            th["log_tau"] = jnp.asarray(base_t + dt)
            th["log_v"] = jnp.asarray(base_v + dv)
            e = floor_at(solver, th, f"{tag} tau*{np.exp(dt):.0e} "
                                     f"v*{np.exp(dv):.0e}")
            if e < best[0]:
                best = (e, (dt, dv))
    print(f"  [{tag}] best {best[0]:.4e} at (dtau,dv)=exp{best[1]}")
    return best


prof = build("profiled")

if "A" in LEGS:
    print(f"=== leg A: adam warmup {NEP_ADAM} ep @ N={N} (f64 CPU) ===")
    adam = build("adam")
    t0 = time.time()
    res = adam.train(NEP_ADAM, verbose=False, mode="chunked", n_evals=10)
    errs = np.asarray(res.log["err_list"])
    print(f"adam trajectory: {[f'{e:.3e}' for e in errs]} "
          f"({time.time() - t0:.0f}s)")
    floor_at(prof, res.params, "A: U* at theta_adam")

if "B" in LEGS:
    print("=== leg B: oracle line at f=100/2pi ===")
    theta = prof.init_params()
    for leaf in ("kernel_paras_1", "kernel_paras_2"):
        kp = dict(theta[leaf])
        freq = np.asarray(kp["freq"]).copy()
        logw = np.full_like(np.asarray(kp["log-w"]), np.log(1e-3))
        freq[0], logw[0] = F_TRUE, 0.0  # dominant exact line
        kp["freq"] = jnp.asarray(freq)
        kp["log-w"] = jnp.asarray(logw)
        theta[leaf] = kp
    scan_tau_v(prof, theta, "B")

if "C" in LEGS:
    print("=== leg C: spectral init at N=400 ===")
    spec = build("profiled", freq_init="spectral")
    theta = spec.init_params()
    f1 = np.asarray(theta["kernel_paras_1"]["freq"])
    print(f"  spectral freqs (axis 1): {np.sort(f1)[-8:]} "
          f"(true line {F_TRUE:.4f})")
    scan_tau_v(prof, theta, "C")
