"""Plotting suite: read-only consumers of the pipeline artifacts
(observables.h5, emulation*.pkl, mcmc.h5). Reference modules: plot_input_data,
plot_emulation, plot_mcmc, plot_qhat, plot_closure, plot_analyses."""

from bayesian_inference_tpu.plots import analyses, closure, emulation, input_data, mcmc, qhat

__all__ = ["analyses", "closure", "emulation", "input_data", "mcmc", "qhat"]
