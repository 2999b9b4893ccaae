"""Post-hoc analysis: rebuild models from checkpoints, regenerate figures.

Replaces the reference's notebook layer and pickle-rebuild helpers
(reference: code/visulization/*.ipynb and utils.get_model_1d/1d_extra/2d/
2d_advection, code/utils.py:622-837 — including the broken
get_model_2d_advection, which references a module that is never imported).

A run directory (written by gphm_tpu.experiment) is self-describing: the
checkpoint's JSON sidecar carries the full RunConfig, so ``load_model``
rebuilds the exact problem + solver and returns ready-to-use parameters —
no pickle fragility, no per-family copies.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from gphm_tpu.experiment import make_solver
from gphm_tpu.utils.checkpoint import load_checkpoint, load_meta
from gphm_tpu.utils.config import RunConfig


def load_model(directory: str, prefer_best: bool = True) \
        -> Tuple[object, dict]:
    """Rebuild (solver, params) from a run directory's fold-0 checkpoint.

    With ``prefer_best`` (default) the argmin-eval checkpoint
    ``params_best_fold0.npz`` is used when present: the final state can be
    far worse than the run's reported min rel-L2 (sharp post-dip drift in
    two-GP phase 2). Pass ``prefer_best=False`` for the final state.
    """
    best_path = os.path.join(directory, "params_best_fold0.npz")
    use_best = prefer_best and os.path.exists(best_path)
    path = best_path if use_best else \
        os.path.join(directory, "params_fold0.npz")
    meta = load_meta(path)["meta"]
    config = RunConfig(**{k: v for k, v in meta.items()
                          if k in RunConfig.__dataclass_fields__})
    if config.dtype_schedule:
        # scheduled runs end (and evaluate) at the final segment's tier —
        # mirror run_experiment's solver_cfg rule so post-hoc prediction
        # matches the run's own reported error exactly
        import dataclasses

        from gphm_tpu.experiment import parse_schedule
        config = dataclasses.replace(
            config,
            dtype=parse_schedule(config.dtype_schedule, config.nepoch)[-1][0],
            dtype_schedule="")
    solver = make_solver(config)
    if config.family == "1d_extra":
        # phase-2 checkpoints hold the extra-GP params; the base params are
        # stored alongside when the phase switch was reached. The best
        # checkpoint records which phase its params belong to.
        base_path = os.path.join(directory, "base_params_fold0.npz")
        phase2 = bool(meta["phase2"]) if use_best \
            else os.path.exists(base_path)
        if phase2:
            base = load_checkpoint(base_path, solver.init_params())
            params = load_checkpoint(
                path, solver.init_params_extra(solver.init_params()))
            return solver, {"base": base, "extra": params}
        # phase-1 params (run ended — or bottomed out — before the switch)
        params = load_checkpoint(path, solver.init_params())
        return solver, {"base": params, "extra": None}
    params = load_checkpoint(path, solver.init_params())
    return solver, params


def predict(solver, params):
    """Posterior-mean prediction on the held-out test grid for any family."""
    if isinstance(params, dict) and "base" in params:
        if params["extra"] is None:
            return np.asarray(solver.predict(params["base"]))
        preds_base = solver.predict(params["base"])
        return np.asarray(
            solver.make_predict_extra(preds_base)(params["extra"]))
    return np.asarray(solver.predict(params))


def rel_l2(solver, params) -> float:
    p = predict(solver, params).reshape(-1)
    t = np.asarray(solver.u_test).reshape(-1)
    return float(np.linalg.norm(p - t) / np.linalg.norm(t))


def compare_runs(directories, out_path: Optional[str] = None,
                 extra_preds: Optional[dict] = None):
    """Shared-scale absolute-error panels across runs (the reference's
    visualization_2d_err_sum notebook behaviour, including its nan_to_num
    guard for diverged advection predictions).

    ``extra_preds`` overlays EXTERNAL methods' predictions alongside the
    runs — the reference's 1D notebook does this with RFF-PINN predictions
    loaded from a pickle it does not ship
    (reference: code/visulization/visualization_1d_pred_sum.ipynb, loading
    ``FINALPREDS-1.pkl``). Keys are panel labels, values are prediction
    arrays on the SAME test grid as the runs (shape-checked); each gets its
    own panel, scored against the first run's truth.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    entries = []
    for d in directories:
        solver, params = load_model(d)
        pred = np.nan_to_num(predict(solver, params))
        truth = np.asarray(solver.u_test)
        entries.append((os.path.basename(os.path.dirname(
            os.path.dirname(d))), solver, pred, truth))
    for name, pred in (extra_preds or {}).items():
        ref_solver, ref_truth = entries[0][1], entries[0][3]
        pred = np.nan_to_num(np.asarray(pred))
        if pred.shape != ref_truth.shape:
            raise ValueError(
                f"extra_preds[{name!r}] shape {pred.shape} does not match "
                f"the runs' test grid {ref_truth.shape}")
        entries.append((name, ref_solver, pred, ref_truth))

    n = len(entries)
    is_2d = entries[0][3].ndim == 2
    fig, axes = plt.subplots(1, n, figsize=(5 * n, 4), squeeze=False)
    if is_2d:
        vmax = max(np.abs(p - t).max() for _, _, p, t in entries)
        for ax, (name, _, pred, truth) in zip(axes[0], entries):
            im = ax.imshow(np.abs(pred - truth), origin="lower",
                           aspect="auto", vmin=0, vmax=vmax)
            err = np.linalg.norm((pred - truth).ravel()) \
                / np.linalg.norm(truth.ravel())
            ax.set_title(f"{name}\nrel-L2 {err:.3g}")
            plt.colorbar(im, ax=ax)
    else:
        for ax, (name, solver, pred, truth) in zip(axes[0], entries):
            x = np.asarray(solver.X_test).reshape(-1)
            ax.plot(x, truth.reshape(-1), lw=1, label="truth")
            ax.plot(x, pred.reshape(-1), lw=1, ls="--", label="pred")
            err = np.linalg.norm(pred.reshape(-1) - truth.reshape(-1)) \
                / np.linalg.norm(truth.reshape(-1))
            ax.set_title(f"{name}\nrel-L2 {err:.3g}")
            ax.legend()
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return fig
