"""Linear-algebra layer tests: robust Cholesky, Kronecker algebra, CG."""

import jax
import jax.numpy as jnp
import numpy as np

from gphm_tpu.ops.chol import robust_cholesky
from gphm_tpu.ops.cg import cg_solve
from gphm_tpu.ops.kron import KronOperator


def spd(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    return jnp.asarray(A @ A.T * scale + n * np.eye(n))


def test_cholesky_solve_and_logdet():
    K = spd(24)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(24, 3)))
    F = robust_cholesky(K)
    np.testing.assert_allclose(np.asarray(F.solve(b)),
                               np.linalg.solve(np.asarray(K), np.asarray(b)),
                               rtol=1e-9)
    np.testing.assert_allclose(float(F.logdet()),
                               np.linalg.slogdet(np.asarray(K))[1], rtol=1e-10)
    assert float(F.jitter_used) == 0.0


def test_jitter_escalation_triggers():
    # indefinite matrix -> plain cholesky produces NaN -> escalation adds
    # enough diagonal to factorize
    A = jnp.asarray(np.diag([1.0, 1.0, -1e-5]))
    F = robust_cholesky(A, base_jitter=1e-6, growth=100.0, max_tries=3)
    assert np.isfinite(np.asarray(F.L)).all()
    assert float(F.jitter_used) > 0


def test_robust_cholesky_grad_clean_when_escalating():
    """Gradients must stay finite even when the escalation path is taken
    (the 0 * NaN trap)."""
    A = jnp.asarray(np.diag([1.0, 1.0, -1e-5]))

    def f(s):
        F = robust_cholesky(A * s, base_jitter=1e-4, growth=100.0, max_tries=3)
        return F.logdet()

    g = jax.grad(f)(1.0)
    assert np.isfinite(float(g))


def test_kron_identities():
    K1, K2 = spd(6, 2), spd(5, 3)
    U = jnp.asarray(np.random.default_rng(4).normal(size=(6, 5)))
    op = KronOperator(K1, K2)

    dense = np.kron(np.asarray(K1), np.asarray(K2))
    vecU = np.asarray(U).reshape(-1)  # row-major vec matches kron(K1, K2)

    np.testing.assert_allclose(np.asarray(op.matvec(U)).reshape(-1),
                               dense @ vecU, rtol=1e-9)
    F = op.factor(base_jitter=0.0, max_tries=0)
    np.testing.assert_allclose(np.asarray(F.solve(U)).reshape(-1),
                               np.linalg.solve(dense, vecU), rtol=1e-8)
    np.testing.assert_allclose(float(F.logdet()),
                               np.linalg.slogdet(dense)[1], rtol=1e-9)
    np.testing.assert_allclose(float(F.quad(U)),
                               vecU @ np.linalg.solve(dense, vecU), rtol=1e-8)


def test_cg_matches_direct_solve():
    K1, K2 = spd(12, 5), spd(10, 6)
    op = KronOperator(K1, K2)
    B = jnp.asarray(np.random.default_rng(7).normal(size=(12, 10)))
    res = cg_solve(op.matvec, B, tol=1e-12, maxiter=500)
    direct = op.factor(base_jitter=0.0, max_tries=0).solve(B)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(direct),
                               rtol=1e-6, atol=1e-8)
    assert int(res.iters) < 500


def test_cg_preconditioned_converges_faster():
    K = spd(64, 8, scale=0.01) + jnp.diag(
        jnp.asarray(np.geomspace(1, 1e4, 64)))
    b = jnp.asarray(np.random.default_rng(9).normal(size=(64,)))
    plain = cg_solve(lambda v: K @ v, b, tol=1e-10, maxiter=3000)
    dinv = 1.0 / jnp.diagonal(K)
    pre = cg_solve(lambda v: K @ v, b, tol=1e-10, maxiter=3000,
                   precond=lambda r: dinv * r)
    assert int(pre.iters) <= int(plain.iters)
    np.testing.assert_allclose(np.asarray(pre.x),
                               np.linalg.solve(np.asarray(K), np.asarray(b)),
                               rtol=1e-5, atol=1e-6)
