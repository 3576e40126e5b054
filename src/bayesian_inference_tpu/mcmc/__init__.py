from bayesian_inference_tpu.mcmc.stats import credible_interval, map_parameters
from bayesian_inference_tpu.mcmc.stretch import run_ensemble

__all__ = ["credible_interval", "map_parameters", "run_ensemble"]
