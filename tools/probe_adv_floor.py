"""CPU probe: is the advection profiled plateau solve-limited or
hyperparameter-limited?

Trains the profiled marginal engine on a reduced advection problem (CPU
f64), then at the final hyperparameters computes the EXACT conditional
optimum U* by densely assembling the (N^2 x N^2) normal operator S and
solving directly. Comparing rel-L2(U*_cg-warm) vs rel-L2(U*_exact) splits
the error budget: if exact ~= cg, the hyperparameters bind (need more
epochs / better objective); if exact << cg, the CG solve binds (need a
better preconditioner or more iterations).

Usage: python tools/probe_adv_floor.py [N] [nepoch] [cg]
(platform forced to CPU via jax.config — this environment's sitecustomize
pre-imports jax with the TPU plugin, so JAX_PLATFORMS in the shell is too
late. The recorded round-3 runs predate this line and executed the
training leg on the axon device in x64; the dense reference solve was
always host numpy f64, and both candidate solutions were evaluated by the
same eval_err, so the exact-vs-warm comparison is internally consistent.)
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
NEP = int(sys.argv[2]) if len(sys.argv) > 2 else 300
CG = int(sys.argv[3]) if len(sys.argv) > 3 else 60
EQ = sys.argv[4] if len(sys.argv) > 4 else "advection-sin"

EQ_CFG = {
    "advection-sin": dict(llk_weight=500.0, freq_scale=40.0, scale=1.0),
    "poisson_2d-sin_sin": dict(llk_weight=200.0, freq_scale=20.0,
                               scale=2 * np.pi),
}[EQ]
cfg = dict(Q=30, lr=0.01, llk_weight=EQ_CFG["llk_weight"], logdet=True,
           tol=-1.0, freq_scale=EQ_CFG["freq_scale"], jitter=1e-6,
           u_mode="profiled", profile_cg_iters=CG, freq_init="spectral",
           beta=200.0)
prob = make_problem(EQ, N_col=N, scale=EQ_CFG["scale"])
solver = Solver2D(prob, "Matern52_Cos_1d", cfg, Policy(jnp.float64))

t0 = time.time()
res = solver.train(NEP, verbose=False, mode="chunked", n_evals=6)
print(f"N={N} nepoch={NEP} cg={CG} wall={time.time() - t0:.0f}s")
print("err trajectory:", [f"{e:.3e}" for e in np.asarray(res.log["err_list"])])

params = res.params
kp1, kp2 = params["kernel_paras_1"], params["kernel_paras_2"]
K1, Kd1 = solver._K_and_Kd(solver.x_col, solver.axis1, kp1)
K2, Kd2 = solver._K_and_Kd(solver.y_col, solver.axis2, kp2)
K1, Kd1, K2, Kd2 = map(np.asarray, (K1, Kd1, K2, Kd2))
wt = float(EQ_CFG["llk_weight"] * np.exp(params["log_tau"]))
v = float(np.exp(params["log_v"]))
a1 = 200.0 if solver.eq_type == "advection" else 1.0
mask = np.asarray(solver._bc_mask)
bgrid = np.asarray(solver._bc_grid)
src = np.asarray(solver.src_loss, np.float64)

# dense normal operator on vec_r(V): A V B -> (A (x) B') vec_r(V)
G = np.kron(K1, K2)
L = a1 * np.kron(Kd1, K2) + np.kron(K1, Kd2)
# W = a1 Kd1 V K2 + K1 V Kd2^T: second term (K1 (x) (Kd2^T)') = K1 (x) Kd2
M = np.diag(mask.reshape(-1))
S = G + wt * (G @ M @ G) + v * (L.T @ L)
S = 0.5 * (S + S.T)
rhs = wt * (G @ (mask * bgrid).reshape(-1)) + v * (L.T @ src.reshape(-1))

t0 = time.time()
Vexact = np.linalg.solve(S, rhs).reshape(N, N)
print(f"dense solve ({N * N}x{N * N}): {time.time() - t0:.0f}s")

Uexact = K1 @ Vexact @ K2
Ucg = K1 @ np.asarray(params["U"], np.float64) @ K2


def rel_l2_on_test(V):
    # the profiled params' "U" leaf stores the whitened V (U = K1 V K2)
    p = dict(params)
    p["U"] = jnp.asarray(V)
    return float(solver.eval_err(p))


print(f"rel-L2 cg-warm U*:  {rel_l2_on_test(np.asarray(params['U'])):.4e}")
print(f"rel-L2 exact  U*:   {rel_l2_on_test(Vexact):.4e}")
print(f"||U_cg - U_exact|| / ||U_exact|| = "
      f"{np.linalg.norm(Ucg - Uexact) / np.linalg.norm(Uexact):.3e}")
