"""Checkpoint / resume.

The reference pickles ``(params[, params_extra], log_dict, trick_paras)`` once
at the end of fold 0 (reference: code/utils.py:580-597) — write-only, JAX-
version-fragile, and with no optimizer state, so no mid-training resume.

Here checkpoints are framework-neutral ``.npz`` archives of flattened pytree
leaves plus a JSON meta sidecar; both params *and* optimizer state round-trip,
enabling exact resume. The directory layout mirrors the reference's
``result_log/<equation>/kernel_<k>[-extra-<k2>]/epoch_<E>/Q<Q>/``
(reference: code/utils.py:550-577) so artifacts stay discoverable.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np


def run_dir(base: str, equation: str, kernel: str,
            kernel_extra: Optional[str], nepoch: int, Q: int) -> str:
    kdir = f"kernel_{kernel}"
    if kernel_extra:
        kdir += f"-extra-{kernel_extra}"
    return os.path.join(base, equation, kdir, f"epoch_{nepoch}", f"Q{Q}")


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(path: str, tree, meta: Optional[dict] = None) -> None:
    """Save any pytree (params, opt_state, (params, opt_state), ...).

    Writes are atomic (temp file + ``os.replace``): the rolling
    ``latest.npz`` is copied by tools/archive_streams.py while runs are
    live, and a torn write would defeat the full-checkpoint archiving
    guarantee it exists to provide (advisor round-4 finding)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = _flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    if not path.endswith(".npz"):
        path = path + ".npz"   # np.savez appends .npz; pin it for replace()
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    side = {"num_leaves": len(leaves), "treedef": str(treedef)}
    if meta:
        side["meta"] = meta
    tmpj = path + ".json.tmp"
    with open(tmpj, "w") as f:
        json.dump(side, f, indent=2, default=str)
    os.replace(tmpj, path + ".json")


def load_checkpoint(path: str, template):
    """Rebuild a pytree saved by save_checkpoint using ``template``'s
    structure (e.g. ``solver.init_params()`` or ``optimizer.init(params)``)."""
    with np.load(path if path.endswith(".npz") else path + ".npz") as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    _, treedef = _flatten(template)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template expects "
            f"{treedef.num_leaves}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_meta(path: str) -> dict:
    with open((path if path.endswith(".npz") else path + ".npz") + ".json") as f:
        return json.load(f)
