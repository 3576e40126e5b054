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
    plot_observable_correlations(observables, plot_dir)


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


def _ols_fit(x: np.ndarray, y: np.ndarray) -> tuple[float, float, float]:
    """Least-squares line y = a + b x; returns (a, b, r_squared)."""
    A = np.c_[np.ones_like(x), x]
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    pred = A @ coef
    ss_res = np.sum((y - pred) ** 2)
    ss_tot = np.sum((y - y.mean()) ** 2)
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
    return float(coef[0]), float(coef[1]), float(r2)


def plot_observable_correlations(
    observables: dict, plot_dir: str, labels: list[str] | None = None,
    n_rms_outlier: float = 3.0, tag: str = "standard",
) -> dict[str, list[int]]:
    """Pairwise correlation study between observables across design points with
    least-squares regression lines and RMS-distance outlier identification
    (reference plot_input_data.py:323-478, statsmodels OLS replaced by a
    numpy least-squares fit). Observables are summarized by their bin-averaged
    prediction per design point. Returns {pair_label: outlier design columns}.
    """
    from bayesian_inference_tpu.io.observables import sorted_observable_list_from_dict

    if labels is None:
        labels = sorted_observable_list_from_dict(observables["Prediction"])
    # summarize each observable as its mean over bins -> (n_design,) series
    series = {
        lbl: np.atleast_2d(observables["Prediction"][lbl]["y"]).mean(axis=0) for lbl in labels
    }
    n = len(labels)
    if n < 2:
        return {}
    fig, axes = plt.subplots(n, n, figsize=(2.1 * n, 2.1 * n))
    outliers: dict[str, list[int]] = {}
    for i in range(n):
        for j in range(n):
            ax = axes[i][j]
            if i == j:
                ax.hist(series[labels[i]], bins=20, color="steelblue")
            elif i > j:
                x, y = series[labels[j]], series[labels[i]]
                a, b, r2 = _ols_fit(x, y)
                resid = y - (a + b * x)
                rms = np.sqrt(np.mean(resid**2))
                bad = np.where(np.abs(resid) > n_rms_outlier * rms)[0]
                ax.plot(x, y, ".", ms=2)
                xs = np.linspace(x.min(), x.max(), 10)
                ax.plot(xs, a + b * xs, "r-", lw=0.8)
                ax.text(0.03, 0.9, f"$R^2$={r2:.2f}", transform=ax.transAxes, fontsize=5)
                if bad.size:
                    ax.plot(x[bad], y[bad], "rx", ms=5)
                    for k in bad:
                        ax.annotate(str(k), (x[k], y[k]), fontsize=4, color="red")
                    outliers[f"{labels[j]} vs {labels[i]}"] = bad.tolist()
            else:
                ax.axis("off")
            ax.tick_params(labelsize=4)
            if i == n - 1:
                ax.set_xlabel(labels[j].replace("__", "\n"), fontsize=4)
            if j == 0:
                ax.set_ylabel(labels[i].replace("__", "\n"), fontsize=4)
    fig.tight_layout()
    fig.savefig(os.path.join(plot_dir, f"observable_correlations__{tag}.pdf"))
    plt.close(fig)
    if outliers:
        flat = sorted({k for v in outliers.values() for k in v})
        logger.warning(f"correlation-study outlier design columns ({tag}): {flat}")
    return outliers
