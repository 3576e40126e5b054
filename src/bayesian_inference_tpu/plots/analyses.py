"""Cross-analysis comparison plots (reference plot_analyses.py): overlay qhat
credible bands from multiple analyses in one figure."""

from __future__ import annotations

import logging
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from bayesian_inference_tpu.io import hdf5
from bayesian_inference_tpu.physics import qhat
from bayesian_inference_tpu.pipeline.configs import MCMCConfig

logger = logging.getLogger(__name__)


def plot(analyses: dict, config_file: str, output_dir: str, confidence: float = 0.9) -> None:
    fig, ax = plt.subplots(figsize=(6, 4.5))
    xs = np.linspace(0.16, 0.5, 50)
    colors = plt.cm.tab10.colors
    plotted = 0

    for idx, (analysis_name, analysis_config) in enumerate(analyses.items()):
        for parameterization in analysis_config["parameterizations"]:
            cfg = MCMCConfig(
                analysis_name=analysis_name,
                parameterization=parameterization,
                analysis_config=analysis_config,
                config_file=config_file,
            )
            mcmc_h5 = os.path.join(cfg.mcmc_output_dir, "mcmc.h5")
            if not os.path.exists(mcmc_h5):
                logger.info(f"No mcmc.h5 for {analysis_name}/{parameterization}; skipping")
                continue
            results = hdf5.read_dict_from_h5(cfg.mcmc_output_dir, "mcmc.h5", verbose=False)
            chain = np.asarray(results["chain"])
            flat = chain.reshape(-1, chain.shape[-1])
            rng = np.random.default_rng(0)
            if flat.shape[0] > 5000:
                flat = flat[rng.choice(flat.shape[0], 5000, replace=False)]
            qs = np.stack([qhat(flat, parameterization, T=float(x), E=100.0) for x in xs], axis=1)
            lo, hi = np.percentile(qs, [(1 - confidence) / 2 * 100, (1 + confidence) / 2 * 100], axis=0)
            color = colors[plotted % len(colors)]
            ax.fill_between(xs, lo, hi, alpha=0.3, color=color, label=f"{analysis_name}")
            ax.plot(xs, np.median(qs, axis=0), color=color, lw=1)
            plotted += 1

    if plotted:
        ax.set_xlabel("T (GeV)")
        ax.set_ylabel(r"$\hat{q}/T^3$")
        ax.set_title("E = 100 GeV", fontsize=9)
        ax.legend(fontsize=7)
        fig.tight_layout()
        os.makedirs(output_dir, exist_ok=True)
        fig.savefig(os.path.join(output_dir, "qhat_across_analyses.pdf"))
    plt.close(fig)
