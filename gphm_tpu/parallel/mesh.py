"""Device-mesh parallelism for GP-HM training.

The reference is strictly single-process, single-device
(SURVEY §2.4: no pmap/pjit/collectives anywhere). The TPU-native scaling
story replaces that with SPMD over a ``jax.sharding.Mesh``:

  * **DP ("data" axis)** — independent training folds / hyperparameter
    sweeps are vmapped into a batch dimension and sharded across the data
    axis (the analog of the reference's sequential fold loop,
    code/model_GP_solver_1d.py:361-379, and of multi-config sweeps in
    run_1d.sh/run_2d.sh).
  * **TP ("model" axis)** — the 2D grid of latent function values ``U``
    (N1, N2) is sharded along its columns. Per-dimension Gram matrices
    K1/K2 (N x N) are replicated — they are small; all the quadratic-cost
    work (triangular solves against U, derivative lifts K_d @ K^-1 U) is
    column-parallel, and XLA/GSPMD inserts the all-gathers for the
    row-space contractions (U @ K2-style products) over ICI.

Everything is expressed as shardings on a jitted train step — no explicit
collectives; XLA chooses psum/all-gather placements (the scaling-book
recipe: pick a mesh, annotate, let the compiler insert collectives).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gphm_tpu.models.base import make_step_fn


def make_mesh(shape: Sequence[int] = None,
              axis_names: Tuple[str, ...] = ("data", "model"),
              devices=None) -> Mesh:
    """Mesh over all (or the given) devices; default 1 x ndev (pure TP)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (1, devices.size)
    return Mesh(devices.reshape(shape), axis_names)


def mesh_from_spec(spec: str, devices=None) -> Mesh:
    """Product-surface mesh: parse a ``--mesh DPxTP`` string ('2x4', '1x8')
    into a (data, model) mesh over the first DP*TP visible devices."""
    try:
        dp, tp = (int(s) for s in spec.lower().split("x"))
    except ValueError:
        raise ValueError(
            f"mesh spec must be 'DPxTP' (e.g. '1x8', '2x4'); got {spec!r}")
    devices = list(devices if devices is not None else jax.devices())
    if dp * tp > len(devices):
        raise ValueError(f"mesh {spec} needs {dp * tp} devices; "
                         f"{len(devices)} visible")
    return make_mesh((dp, tp), devices=devices[:dp * tp])


def state_placer(mesh: Mesh, params: dict):
    """Placement function for a training run on ``mesh``.

    The latent function values (the only large parameter — ``U`` (N1, N2)
    for the 2D/advection families, ``u`` (N, 1) for 1D) go on the model
    axis; every other leaf (mixture hyperparameters, noise precisions, Adam
    scalars) is replicated. The returned ``place(tree)`` works on any tree
    whose large leaves are param-shaped — params themselves and Adam's
    mu/nu mirrors — so a single placer commits the whole optimizer state.

    Once inputs are committed, plain ``jax.jit`` (the chunk runner, eval,
    predict) compiles against those shardings and GSPMD inserts the ICI
    collectives — the scaling-book recipe; no explicit collectives anywhere.
    """
    repl = NamedSharding(mesh, P())
    by_shape = {}
    if "U" in params:                      # 2D grid: shard columns
        by_shape[tuple(params["U"].shape)] = NamedSharding(
            mesh, P(None, "model"))
    if "u" in params:                      # 1D latent: shard rows
        spec = P("model") if params["u"].ndim == 1 else P("model", None)
        by_shape[tuple(params["u"].shape)] = NamedSharding(mesh, spec)

    def place(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, by_shape.get(tuple(getattr(x, "shape", ())), repl)),
            tree)

    return place


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_2d(mesh: Mesh, batched: bool = False):
    """Sharding pytree for the 2D solver parameters.

    U columns go on the model axis; mixture/noise parameters are tiny and
    replicated. With ``batched`` (DP over folds) the leading batch axis of
    every leaf goes on the data axis.
    """
    def spec(*axes):
        if batched:
            return NamedSharding(mesh, P("data", *axes))
        return NamedSharding(mesh, P(*axes))

    kp = {"log-w": spec(), "log-ls": spec(), "freq": spec()}
    return {
        "log_tau": spec(),
        "log_v": spec(),
        "kernel_paras_1": dict(kp),
        "kernel_paras_2": dict(kp),
        "U": spec(None, "model"),
    }


def sharded_train_step_2d(solver, mesh: Mesh, *, batched: bool = False,
                          optimizer=None):
    """Jitted (DP x TP)-sharded full training step for the 2D solver.

    Returns ``(step, param_sharding)`` where ``step(params, opt_state)``
    runs one Adam update of the full MAP objective. With ``batched``, params
    carry a leading fold axis (vmapped step = data parallelism).
    """
    optimizer = optimizer or solver.optimizer
    step = make_step_fn(solver._loss, optimizer)
    if batched:
        step = jax.vmap(step)

    pshard = shard_params_2d(mesh, batched)
    oshard = None  # let the compiler propagate opt-state shardings from params

    return jax.jit(
        step,
        in_shardings=(pshard, oshard),
        out_shardings=(pshard, oshard, NamedSharding(
            mesh, P("data") if batched else P())),
    ), pshard


def device_put_params(params, sharding_tree):
    return jax.tree_util.tree_map(jax.device_put, params, sharding_tree)
