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
              mesh: Optional[Mesh] = None, chunk: int = 1000):
    """Train all variants concurrently; returns (batched_params, errs).

    Each variant gets an independent Adam state (vmapped init so scalar
    counters batch correctly). With a mesh, the batch axis is sharded over
    'data' and everything else is replicated.
    """
    optimizer = solver.optimizer
    step = make_step_fn(solver._loss, optimizer)

    opt_state = jax.vmap(optimizer.init)(batched_params)

    @partial(jax.jit, static_argnums=(2,), donate_argnums=(0, 1))
    def run_chunk(params, opt_state, nsteps):
        def body(carry, _):
            p, o = carry
            p, o, loss = jax.vmap(step)(p, o)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), xs=None, length=nsteps)
        return params, opt_state, losses[-1]

    if mesh is not None:
        def shard_batch(tree):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(
                    x, NamedSharding(mesh, P("data",
                                             *([None] * (x.ndim - 1))))),
                tree)

        batched_params = shard_batch(batched_params)
        opt_state = shard_batch(opt_state)

    done = 0
    loss = None
    while done < nepoch:
        k = min(chunk, nepoch - done)
        batched_params, opt_state, loss = run_chunk(
            batched_params, opt_state, k)
        done += k

    errs = jax.vmap(solver._eval_err)(batched_params)
    return batched_params, np.asarray(errs), np.asarray(loss)
