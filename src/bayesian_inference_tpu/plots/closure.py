"""Closure-test plots (reference plot_closure.py): per-validation-point qhat
posterior vs truth, and summary success fractions with binomial uncertainties."""

from __future__ import annotations

import logging
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from bayesian_inference_tpu.io import hdf5
from bayesian_inference_tpu.plots import qhat as plot_qhat_mod
from bayesian_inference_tpu.plots.utils import ensure_plot_dir

logger = logging.getLogger(__name__)


def efficiency_uncertainty(k: int, n: int) -> float:
    """Bayesian binomial efficiency uncertainty (uniform prior):
    var = <e^2> - <e>^2 with e ~ Beta(k+1, n-k+1) (reference plot_closure.py:264-290)."""
    if n == 0:
        return 0.0
    mean = (k + 1) / (n + 2)
    second = (k + 2) * (k + 1) / ((n + 3) * (n + 2))
    return float(np.sqrt(second - mean**2))


def plot(config) -> None:
    closure_base = os.path.join(config.output_dir, "closure", "results")
    if not os.path.isdir(closure_base):
        logger.info(f"No closure results at {closure_base}; skipping closure plots")
        return
    plot_dir = ensure_plot_dir(config.output_dir, "plot_closure")

    indices = sorted(int(i) for i in os.listdir(closure_base) if i.isdigit())
    successes_T, totals = 0, 0
    per_point = []
    for i in indices:
        run_dir = os.path.join(closure_base, str(i))
        if not os.path.exists(os.path.join(run_dir, "mcmc.h5")):
            continue
        results = hdf5.read_dict_from_h5(run_dir, "mcmc.h5", verbose=False)
        chain = np.asarray(results["chain"]).reshape(-1, np.asarray(results["chain"]).shape[-1])
        truth = np.asarray(results["design_point"])
        containment = plot_qhat_mod.plot_qhat_band(
            chain, config, ensure_plot_dir(plot_dir, f"point_{i}"), "qhat_vs_T.pdf",
            vs="T", fixed=100.0, target_design_point=truth,
        )
        if containment is not None:
            frac = containment.mean()
            per_point.append((i, frac))
            successes_T += int(frac > 0.5)
            totals += 1

    if totals:
        eff = successes_T / totals
        err = efficiency_uncertainty(successes_T, totals)
        fig, ax = plt.subplots(figsize=(6, 4))
        pts = np.array(per_point)
        ax.bar(pts[:, 0], pts[:, 1], color="steelblue")
        ax.axhline(0.9, color="r", ls="--", label="target 90%")
        ax.set_xlabel("validation design point")
        ax.set_ylabel("fraction of qhat(T) curve inside 90% CR")
        ax.set_title(f"closure success: {eff:.2f} +- {err:.2f} ({successes_T}/{totals})")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(plot_dir, "closure_summary.pdf"))
        plt.close(fig)
