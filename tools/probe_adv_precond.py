"""CPU probe: preconditioner quality for the advection profiled normal solve.

Hypothesis (round 3): the separable eigenbasis-diagonal preconditioner
(ops/kron_profile.precond_diag) drops the beta-weighted cross coupling
a1*(K2 Kd2 (x) Kd1' K1 + sym) because the Rayleigh diagonal d = diag(Q'KdQ)
of an ANTISYMMETRIC first-derivative cross-Gram is ~0 — the derivative acts
as a rotation WITHIN each near-degenerate (cos, sin) eigenpair of a
stationary K, i.e. the coupling lives on 2x2 blocks of paired eigenvectors.
A paired-2x2-block (4x4 in the 2D product basis) preconditioner should
capture it.

This probe builds the dense normal operator S at small N for the advection
config (beta=200) and measures actual PCG convergence under (a) the shipped
diagonal preconditioner, (b) the 2x2-paired block preconditioner.

Usage: python tools/probe_adv_precond.py [N]
(platform forced to CPU via jax.config — sitecustomize pre-imports jax
with the TPU plugin, so JAX_PLATFORMS in the shell is too late.)
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gphm_tpu.ops.gram import AxisGram
from gphm_tpu.ops.kernels import get_kernel
from gphm_tpu.ops.kron_profile import axis_spec, precond_diag

N = int(sys.argv[1]) if len(sys.argv) > 1 else 48
BETA = 200.0
Q_MIX = 30

rng = np.random.default_rng(0)
x = jnp.linspace(0.0, 1.0, N)
kernel = get_kernel("Matern52_Cos_1d")
# spectral-init-like advection params: components bracketing beta/2pi
freqs = jnp.linspace(0.0, 40.0, Q_MIX)
params = {"log-w": jnp.full((Q_MIX,), -np.log(Q_MIX)),
          "log-ls": jnp.zeros((Q_MIX,)), "freq": freqs}
ax = AxisGram(x, jnp.float64)
K = np.asarray(ax.gram(kernel, params, jitter=1e-6))
Kd = np.asarray(ax.gram(kernel, params, deriv=1))

wt = 500.0 * 1.0   # llk_weight * tau at init
v = 1.0
a1 = BETA

# dense S on vec(V), column-major over (i, j) with V (N1, N2): use numpy kron
# with vec(V) = (K2 (x) K1) ... adopt row-major: vec_r(A V B') = (A (x) B) vec_r(V)
# Lift W = a1 Kd1 V K2 + K1 V Kd2^T  ->  L = a1 (Kd1 (x) K2') + (K1 (x) Kd2)
# with row-major vec and  A V B -> (A (x) B') vec_r(V).
I = np.eye(N)
mask = np.zeros((N, N))
mask[0, :] += 1; mask[-1, :] += 1; mask[:, 0] += 1; mask[:, -1] += 1

K1 = K2 = K
Kd1 = Kd2 = Kd
G = np.kron(K1, K2)                      # T = K1 V K2 (K2 symmetric)
L = a1 * np.kron(Kd1, K2) + np.kron(K1, Kd2)   # W  (Kd2^T -> (Kd2^T)' = Kd2)
M = np.diag(mask.reshape(-1))
S = G + wt * (np.kron(K1, K2) @ M @ np.kron(K1, K2)) + v * (L.T @ L)
S = 0.5 * (S + S.T)

s1 = axis_spec(jnp.asarray(K1), jnp.asarray(Kd1))
s2 = axis_spec(jnp.asarray(K2), jnp.asarray(Kd2))
Pd = np.asarray(precond_diag(a1, wt, v, s1, s2))
Q1, Q2 = np.asarray(s1.Q), np.asarray(s2.Q)


def pcg_iters(S, minv, b, tol=1e-8, maxit=3000):
    xs = np.zeros_like(b)
    r = b.copy()
    z = minv(r)
    p = z
    rz = r @ z
    nb = np.linalg.norm(b)
    for it in range(maxit):
        Ap = S @ p
        alpha = rz / (p @ Ap)
        xs += alpha * p
        r -= alpha * Ap
        if np.linalg.norm(r) < tol * nb:
            return it + 1
        z = minv(r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    return maxit


def minv_diag(r):
    R = r.reshape(N, N)
    return (Q1 @ ((Q1.T @ R @ Q2) / Pd) @ Q2.T).reshape(-1)


# ---- 2x2-paired block preconditioner ----
# adjacent pairing after eigh's ascending sort; per-axis 2x2 projected blocks
def pair_blocks(Km, Kdm, Qm):
    n2 = N // 2
    lam = np.einsum("ik,ij,jk->k", Qm, Km, Qm)
    D = Qm.T @ Kdm @ Qm
    Ssq = (Kdm @ Qm).T @ (Kdm @ Qm)
    lam_b = lam.reshape(n2, 2)
    D_b = np.stack([D[2 * i:2 * i + 2, 2 * i:2 * i + 2] for i in range(n2)])
    S_b = np.stack([Ssq[2 * i:2 * i + 2, 2 * i:2 * i + 2] for i in range(n2)])
    rho = (Qm[0] ** 2 + Qm[-1] ** 2).reshape(n2, 2)
    return lam_b, D_b, S_b, rho


l1b, D1b, S1b, r1b = pair_blocks(K1, Kd1, Q1)
l2b, D2b, S2b, r2b = pair_blocks(K2, Kd2, Q2)
n2 = N // 2

# 4x4 blocks over (pair_k, pair_l): order (axis1 in-pair a, axis2 in-pair b)
blocks = np.zeros((n2, n2, 4, 4))
for k in range(n2):
    L1 = np.diag(l1b[k])
    for l in range(n2):
        L2 = np.diag(l2b[l])
        # projected lift on the 4-dim subspace: a1 D1 (x) L2 + L1 (x) D2
        J = a1 * np.kron(D1b[k], L2) + np.kron(L1, D2b[l])
        # Cauchy-Schwarz spread completing the projection of the product
        sp1 = S1b[k] - D1b[k].T @ D1b[k]
        sp2 = S2b[l] - D2b[l].T @ D2b[l]
        res = J.T @ J + a1 ** 2 * np.kron(sp1, L2 @ L2) \
            + np.kron(L1 @ L1, sp2)
        prior = np.kron(L1, L2)
        # boundary: same scalar leverage approximation as precond_diag,
        # kept diagonal inside the 4x4 block
        lev = (r1b[k][:, None] + r2b[l][None, :]).reshape(-1)
        bnd = np.diag(np.diag(np.kron(L1 @ L1, L2 @ L2)) * lev)
        P4 = prior + wt * bnd + v * res
        blocks[k, l] = 0.5 * (P4 + P4.T)

binv = np.linalg.inv(blocks + 1e-300 * np.eye(4))


def minv_block(r):
    R = r.reshape(N, N)
    Rt = Q1.T @ R @ Q2                       # eigenbasis, (N, N)
    Rb = Rt.reshape(n2, 2, n2, 2).transpose(0, 2, 1, 3).reshape(n2, n2, 4)
    Yb = np.einsum("klab,klb->kla", binv, Rb)
    Yt = Yb.reshape(n2, n2, 2, 2).transpose(0, 2, 1, 3).reshape(N, N)
    return (Q1 @ Yt @ Q2.T).reshape(-1)


b = rng.normal(size=N * N)
evals = np.linalg.eigvalsh(S)
print(f"N={N} beta={BETA}: cond(S) = {evals[-1] / evals[0]:.3e}")
it_none = pcg_iters(S, lambda r: r, b)
it_diag = pcg_iters(S, minv_diag, b)
it_blk = pcg_iters(S, minv_block, b)
print(f"PCG iters to 1e-8: none={it_none} diag={it_diag} block2x2={it_blk}")
