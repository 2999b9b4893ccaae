"""Data-parallel hyperparameter sweeps and multi-fold training.

The reference runs folds sequentially in a Python loop
(code/model_GP_solver_1d.py:361-379) and hyperparameter sweeps as separate
shell invocations (run_1d.sh). Here a batch of parameter initializations
(different seeds, freq_scales, Q-subsets, ...) trains **concurrently**: the
training step is vmapped over the batch and the batch axis is sharded over
the mesh's data axis, so every fold/variant runs on its own slice of the
device (or its own device on a multi-chip mesh).
"""

from __future__ import annotations

import time
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gphm_tpu.models.base import make_step_fn


def stack_pytrees(trees: List):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def sweep_variants(solver, base_params, *, freq_scales=None, seeds=None):
    """Construct a batch of parameter pytrees varying one knob.

    ``freq_scales`` rescales the mixture frequency grid (the reference's main
    per-equation tuning knob, config/*.yaml freq_scale); ``seeds`` draws
    different random u initializations (requires config['init_u'] random).
    """
    variants = []
    if freq_scales is not None:
        base_fs = float(solver.config["freq_scale"])
        kp_keys = [k for k in base_params if k.startswith("kernel_paras")]
        for fs in freq_scales:
            p = jax.tree_util.tree_map(jnp.copy, base_params)
            for k in kp_keys:   # 1D: kernel_paras; 2D: kernel_paras_{1,2}
                p[k]["freq"] = base_params[k]["freq"] * (fs / base_fs)
            variants.append(p)
    elif seeds is not None:
        for s in seeds:
            variants.append(solver.init_params(seed=s))
    else:
        raise ValueError("give freq_scales or seeds")
    return stack_pytrees(variants)


def run_sweep(solver, batched_params, nepoch: int, *,
              mesh: Optional[Mesh] = None, chunk: int = 1000,
              return_state: bool = False):
    """Train all variants concurrently; returns (batched_params, errs, loss)
    or, with ``return_state``, (batched_params, opt_state, errs, loss).

    Each variant gets an independent Adam state (vmapped init so scalar
    counters batch correctly). With a mesh, the batch axis is sharded over
    'data' and everything else is replicated.
    """
    optimizer = solver.optimizer
    step = make_step_fn(solver._loss, optimizer,
                        getattr(solver, "_prepare_step", None))

    opt_state = jax.vmap(optimizer.init)(batched_params)

    # nsteps is a traced operand (see models.base.make_chunk_runner): one
    # compile covers every launch length the adaptive sizing below emits.
    @partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(params, opt_state, nsteps):
        params, opt_state, loss = jax.vmap(step)(params, opt_state)

        def body(_, carry):
            p, o, _ = carry
            p, o, l = jax.vmap(step)(p, o)
            return (p, o, l)

        return jax.lax.fori_loop(0, nsteps - 1, body,
                                 (params, opt_state, loss))

    if mesh is not None:
        data_size = int(mesh.shape["data"])
        B = jax.tree_util.tree_leaves(batched_params)[0].shape[0]
        if B % data_size != 0:
            raise ValueError(
                f"sweep batch of {B} variants does not divide the mesh "
                f"data axis ({data_size}): device_put would fail. Pad the "
                f"batch to a multiple of {data_size}, resize the mesh, or "
                f"pass mesh=None.")

        def shard_batch(tree):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(
                    x, NamedSharding(mesh, P("data",
                                             *([None] * (x.ndim - 1))))),
                tree)

        batched_params = shard_batch(batched_params)
        opt_state = shard_batch(opt_state)

    # Adaptive launch sizing (same scheme as models.base.chunked_train):
    # a vmapped refined-tier step can cost >100 ms, so a fixed 1000-step
    # launch runs for minutes and trips the TPU worker watchdog (observed
    # live, campaign U2). Ramp short, measure the warm rate, then fit each
    # launch to ~20 s of device time (the dynamic-length runner compiles
    # once; every launch after the first is warm whatever its length).
    LAUNCH_TARGET_S = 20.0
    RAMP = 8
    seen: set = set()
    rate = None
    done = 0
    loss = None
    while done < nepoch:
        cap = chunk if rate is not None else RAMP
        k = min(cap, nepoch - done)
        warm = bool(seen)
        t0 = time.time()
        batched_params, opt_state, loss = run_chunk(
            batched_params, opt_state, k)
        if warm:
            jax.block_until_ready(loss)
            r = (time.time() - t0) / k
            rate = r if rate is None else min(rate, r)
            fit = int(LAUNCH_TARGET_S / max(rate, 1e-9))
            q = RAMP
            while q * 2 <= fit:
                q *= 2
            chunk = min(chunk, q)
        seen.add(k)
        done += k

    errs = jax.vmap(solver._eval_err)(batched_params)
    if return_state:
        return batched_params, opt_state, np.asarray(errs), np.asarray(loss)
    return batched_params, np.asarray(errs), np.asarray(loss)


def multi_start_variants(solver, K: int):
    """``K`` parameter initializations differing in the mixture frequency
    grid, stacked for vmapped training.

    The MAP objective is highly oscillatory in the mixture frequencies
    (basin width ~1/span), so a single gradient descent from the reference's
    linspace init can stall far from the solution's spectral lines — the
    failure mode of the hardest shipped config (``x2_add_sinx``, PARITY
    round-2 campaign). Variants:

      0. the config's own init (``freq_init``: linspace or spectral),
      1. the *other* init mode (periodogram placement vs uniform),
      2+ alternating rescaled linspace grids (x0.5, x2, x0.75, ...) and
         stratified-random grids over [0, freq_scale] (deterministic seeds).
    """
    base = solver.init_params()
    kp_keys = [k for k in base if k.startswith("kernel_paras")]
    Q = int(solver.config["Q"])
    fs = float(solver.config["freq_scale"])
    fdtype = base[kp_keys[0]]["freq"].dtype

    variants = [base]
    mode = solver.config.get("freq_init", "linspace")
    if K > 1:
        other = "spectral" if mode != "spectral" else "linspace"
        solver.config["freq_init"] = other
        try:
            variants.append(solver.init_params())
        except Exception:
            pass  # no source spectrum available: fall through to grids
        finally:
            solver.config["freq_init"] = mode

    mults = [0.5, 2.0, 0.75, 1.5, 1.25, 0.6, 1.75, 0.9, 0.4, 1.1]
    j = 0
    while len(variants) < K:
        p = jax.tree_util.tree_map(jnp.copy, base)
        if j % 2 == 0 and j // 2 < len(mults):
            freq = np.linspace(0.0, 1.0, Q) * fs * mults[j // 2]
        else:
            rng = np.random.default_rng(7919 + j)
            freq = np.sort((np.arange(Q) + rng.uniform(size=Q)) / Q * fs)
        for k in kp_keys:
            p[k]["freq"] = jnp.asarray(freq, fdtype)
        variants.append(p)
        j += 1
    return stack_pytrees(variants[:K])


def multi_start_train(solver, warmup: int, K: int, *,
                      mesh: Optional[Mesh] = None, chunk: int = 1000,
                      batch: Optional[int] = None, verbose: bool = True):
    """Warm up ``K`` frequency initializations concurrently, keep the best.

    All starts train as one vmapped (mesh: data-axis-sharded) program for
    ``warmup`` epochs; the winner is chosen by the reference's early-stop
    criterion ``boundary_gap/N_b + eq_gap/N_col`` — training data only, no
    test-error peeking. Returns ``(params, opt_state, info)`` ready to
    continue the run from epoch ``warmup``.

    ``batch`` caps how many starts train concurrently: groups of that size
    run sequentially through the same compiled program, the rest stay on
    host. Needed when K x the per-start working set exceeds device memory —
    measured: 8 vmapped N_col=900 Q=30 starts want 28.3 GB of the v5e's
    15.75 GB HBM (~3.5 GB/start), so ``batch=2..4`` is the fit there.
    """
    batched = multi_start_variants(solver, K)
    B = K if batch is None else max(1, min(int(batch), K))
    crit_fn = jax.jit(solver._criterion)
    all_crit, all_err = [], []
    best = None  # (criterion, params, opt_state)
    data_size = int(mesh.shape["data"]) if mesh is not None else 1
    for g0 in range(0, K, B):
        gsz = min(B, K - g0)  # the final group can be a remainder
        # groups that do not divide the mesh's data axis train unsharded
        # (device_put on a non-divisible batch axis fails outright;
        # documented batch=2..4 on a 1x8 mesh is an easy hit — ADVICE r3)
        use_mesh = mesh if (gsz > 1 and gsz % data_size == 0) else None
        if mesh is not None and use_mesh is None and verbose:
            print(f"  multi-start group [{g0}:{g0 + gsz}] of {gsz} does "
                  f"not divide the data axis ({data_size}); training it "
                  f"unsharded")
        sub = jax.tree_util.tree_map(lambda x: x[g0:g0 + B], batched)
        sub, opt_state, errs, _ = run_sweep(
            solver, sub, warmup, mesh=use_mesh, chunk=chunk,
            return_state=True)
        crit = np.asarray(jax.vmap(crit_fn)(sub))
        j = int(np.argmin(crit))
        if best is None or crit[j] < best[0]:
            pick = lambda t: jax.tree_util.tree_map(
                lambda x: jnp.copy(x[j]), t)
            best = (float(crit[j]), pick(sub), pick(opt_state))
        all_crit += [float(c) for c in crit]
        all_err += [float(e) for e in errs]
    chosen = int(np.argmin(all_crit))
    if verbose:
        for i in range(K):
            mark = " <- chosen" if i == chosen else ""
            print(f"  start {i}: criterion {all_crit[i]:.6g} "
                  f"(rel-L2 {all_err[i]:.4g}){mark}")
    info = {"chosen": chosen, "criteria": all_crit,
            "rel_l2": all_err, "warmup_epochs": int(warmup),
            "n_starts": int(K)}
    return best[1], best[2], info
