"""Shared plotting helpers (reference plot_utils.py)."""

from __future__ import annotations

import logging
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

logger = logging.getLogger(__name__)


def ensure_plot_dir(base_dir: str, name: str) -> str:
    plot_dir = os.path.join(base_dir, name)
    os.makedirs(plot_dir, exist_ok=True)
    return plot_dir


def latex_from_tlatex(s: str) -> str:
    """Convert ROOT TLatex markup to matplotlib LaTeX (reference plot_utils.py:175-192)."""
    s = f"${s}$"
    s = s.replace("#it", "")
    s = s.replace(" ", r"\;")
    s = s.replace("#", "\\")
    s = s.replace("SD", r"\;SD")
    s = s.replace(",", r",\;")
    s = s.replace("anti-k", r"anti\textendash k")
    s = s.replace("ch jet", r"ch\;jet")
    s = s.replace("ch", r"\mathrm{ch}\;")
    return s


def observable_panels(
    plot_list: list[dict],
    labels: list[str],
    colors: list[str],
    config,
    plot_dir: str,
    filename: str,
    observables: dict,
    sorted_labels: list[str],
    ylabel: str = "",
    plot_exp_data: bool = True,
):
    """Multi-panel per-observable grid: central values (+bands) per observable.

    A simplified, self-contained version of the reference's
    plot_observable_panels (plot_utils.py:24-172): one subplot per observable,
    x = bin centers, one curve/band per entry of plot_list
    ({'central_value': (B, F) or mean dict, 'cov': optional}). The grid shape
    follows the analysis config's ``plot_panel_shapes`` when present.
    """
    n = len(sorted_labels)
    if n == 0:
        return
    shapes = getattr(config, "analysis_config", {}).get("plot_panel_shapes") if config else None
    if shapes:
        ncols = int(shapes[0][1])
    else:
        ncols = 4
    nrows = int(np.ceil(n / ncols))
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False)

    start = 0
    for i, label in enumerate(sorted_labels):
        ax = axes[i // ncols][i % ncols]
        data = observables["Data"][label]
        x = 0.5 * (np.atleast_1d(data["xmin"]) + np.atleast_1d(data["xmax"]))
        n_bins = len(x)
        for entry, curve_label, color in zip(plot_list, labels, colors):
            vals = entry["central_value"][:, start : start + n_bins]
            mid = np.median(vals, axis=0)
            lo, hi = np.percentile(vals, [5, 95], axis=0)
            ax.plot(x, mid, color=color, label=curve_label, lw=1)
            if vals.shape[0] > 1:
                ax.fill_between(x, lo, hi, color=color, alpha=0.25, lw=0)
        if plot_exp_data:
            ax.errorbar(
                x, np.atleast_1d(data["y"]), yerr=np.atleast_1d(data["y_err"]),
                fmt="ko", ms=3, lw=1, label="data",
            )
        ax.set_title(label.replace("__", " "), fontsize=6)
        ax.set_ylabel(ylabel, fontsize=7)
        if i == 0:
            ax.legend(fontsize=6)
        start += n_bins

    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    fig.savefig(os.path.join(plot_dir, filename))
    plt.close(fig)
