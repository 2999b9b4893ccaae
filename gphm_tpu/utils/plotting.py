"""Training-diagnostic figures.

Re-creation of the reference's multi-panel matplotlib diagnostics
(reference: code/utils.py:47-547 — make_fig_1d / make_fig_2d /
make_fig_1d_extra_GP / make_fig_2d_extra_GP): prediction vs truth, loss and
error curves, and the evolution of the mixture weights / frequencies /
lengthscales over training. One adaptive implementation instead of four
copies; panels appear according to what the solver family logged.
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _scatter_evolution(ax, epochs, series, title):
    """Per-component scatter over eval epochs (reference plots each mixture
    component's trajectory; code/utils.py:95-143)."""
    arr = np.asarray(series)  # (n_evals, Q)
    for q in range(arr.shape[1]):
        ax.scatter(epochs, arr[:, q], s=4)
    ax.set_title(title)
    ax.set_xlabel("epoch")


def training_figure(solver, result, path: str):
    log = result.log
    epochs = log["epoch_list"]
    is_2d = hasattr(solver, "N1")

    if is_2d:
        fig, axes = plt.subplots(3, 3, figsize=(15, 12))
        pred = np.asarray(solver.predict(result.params))
        truth = np.asarray(solver.u_test)
        im0 = axes[0, 0].imshow(pred, origin="lower", aspect="auto")
        axes[0, 0].set_title("prediction")
        plt.colorbar(im0, ax=axes[0, 0])
        im1 = axes[0, 1].imshow(truth, origin="lower", aspect="auto")
        axes[0, 1].set_title("truth")
        plt.colorbar(im1, ax=axes[0, 1])
        im2 = axes[0, 2].imshow(np.abs(pred - truth), origin="lower",
                                aspect="auto")
        axes[0, 2].set_title("abs error")
        plt.colorbar(im2, ax=axes[0, 2])

        axes[1, 0].plot(epochs, log["loss_list"])
        axes[1, 0].set_title("loss (log when > 1)")
        axes[1, 1].plot(epochs, log["err_list"])
        axes[1, 1].set_yscale("log")
        axes[1, 1].set_title("relative L2 error")
        axes[1, 2].axis("off")

        for j, tag in enumerate(("k1", "k2")):
            if f"w_list_{tag}" in log:
                _scatter_evolution(axes[2, j], epochs, log[f"w_list_{tag}"],
                                   f"weights {tag}")
        if "freq_list_k1" in log:
            _scatter_evolution(axes[1, 2], epochs, log["freq_list_k1"],
                               "frequencies k1")
            axes[1, 2].axis("on")
        if "ls_list_k1" in log:
            _scatter_evolution(axes[2, 2], epochs, log["ls_list_k1"],
                               "lengthscales k1")
    else:
        fig, axes = plt.subplots(2, 3, figsize=(15, 8))
        xte = np.asarray(solver.X_test).reshape(-1)
        truth = np.asarray(solver.u_test).reshape(-1)
        # the final predictor (phase-2 aware for the extra solver)
        if hasattr(result, "extras") and result.extras.get("base_params") \
                is not None:
            base = result.extras["base_params"]
            pred = np.asarray(
                solver.make_predict_extra(solver.predict(base))(
                    result.params))
        else:
            pred = np.asarray(solver.predict(result.params))
        axes[0, 0].plot(xte, truth, label="truth", lw=1)
        axes[0, 0].plot(xte, pred, label="pred", lw=1, ls="--")
        axes[0, 0].legend()
        axes[0, 0].set_title("prediction vs truth")

        axes[0, 1].plot(epochs, log["loss_list"])
        axes[0, 1].set_title("loss (log when > 1)")
        axes[0, 2].plot(epochs, log["err_list"])
        axes[0, 2].set_yscale("log")
        axes[0, 2].set_title("relative L2 error")

        if "w_list" in log:
            _scatter_evolution(axes[1, 0], epochs, log["w_list"], "weights")
            _scatter_evolution(axes[1, 1], epochs, log["freq_list"],
                               "frequencies")
            _scatter_evolution(axes[1, 2], epochs, log["ls_list"],
                               "lengthscales")

    fig.suptitle(f"{solver.problem.equation} / {solver.kernel.name}  "
                 f"min rel-L2 {result.min_err:.3g}")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def error_heatmap(solver, params, path: str):
    """Post-hoc absolute-error map (reference notebook
    visualization_2d_err_sum.ipynb)."""
    pred = np.nan_to_num(np.asarray(solver.predict(params)))
    truth = np.asarray(solver.u_test)
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(np.abs(pred - truth), origin="lower", aspect="auto")
    plt.colorbar(im, ax=ax)
    ax.set_title(f"{solver.problem.equation} abs error")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
