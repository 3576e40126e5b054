from bayesian_inference_tpu.physics.qhat import qhat
from bayesian_inference_tpu.physics.priors import generate_prior_samples

__all__ = ["qhat", "generate_prior_samples"]
