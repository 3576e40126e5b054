"""Input-data plots (reference plot_input_data.py): all-design-point prediction
spaghetti per observable (standard and preprocessed), design-point pairplot."""

from __future__ import annotations

import logging
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from bayesian_inference_tpu.io import hdf5, observables as obs_io
from bayesian_inference_tpu.plots.utils import ensure_plot_dir

logger = logging.getLogger(__name__)


def plot(config) -> None:
    h5_path = os.path.join(config.output_dir, "observables.h5")
    if not os.path.exists(h5_path):
        logger.info(f"No observables.h5 at {h5_path}; skipping input-data plots")
        return
    plot_dir = ensure_plot_dir(config.output_dir, "plot_input_data")

    for filename, tag in (("observables.h5", "standard"), ("observables_preprocessed.h5", "preprocessed")):
        if not os.path.exists(os.path.join(config.output_dir, filename)):
            continue
        observables = hdf5.read_dict_from_h5(config.output_dir, filename, verbose=False)
        _plot_prediction_spaghetti(observables, plot_dir, tag)

    observables = hdf5.read_dict_from_h5(config.output_dir, "observables.h5", verbose=False)
    _plot_design_pairplot(np.atleast_2d(observables["Design"]), plot_dir)


def _plot_prediction_spaghetti(observables: dict, plot_dir: str, tag: str) -> None:
    labels = obs_io.sorted_observable_list_from_dict(observables["Prediction"])
    ncols = 4
    nrows = int(np.ceil(len(labels) / ncols))
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False)
    for i, label in enumerate(labels):
        ax = axes[i // ncols][i % ncols]
        data = observables["Data"][label]
        x = 0.5 * (np.atleast_1d(data["xmin"]) + np.atleast_1d(data["xmax"]))
        y = np.atleast_2d(observables["Prediction"][label]["y"])
        ax.plot(x, y, lw=0.2, alpha=0.3, color="steelblue")
        ax.errorbar(x, np.atleast_1d(data["y"]), yerr=np.atleast_1d(data["y_err"]),
                    fmt="ko", ms=2, lw=1)
        ax.set_title(label.replace("__", " "), fontsize=6)
    for j in range(len(labels), nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    fig.savefig(os.path.join(plot_dir, f"predictions__{tag}.pdf"))
    plt.close(fig)


def _plot_design_pairplot(design: np.ndarray, plot_dir: str) -> None:
    d = design.shape[1]
    fig, axes = plt.subplots(d, d, figsize=(2 * d, 2 * d))
    for i in range(d):
        for j in range(d):
            ax = axes[i][j]
            if i == j:
                ax.hist(design[:, i], bins=20, color="darkorange")
            elif i > j:
                ax.plot(design[:, j], design[:, i], ".", ms=2)
            else:
                ax.axis("off")
            ax.tick_params(labelsize=5)
    fig.tight_layout()
    fig.savefig(os.path.join(plot_dir, "design_pairplot.pdf"))
    plt.close(fig)
