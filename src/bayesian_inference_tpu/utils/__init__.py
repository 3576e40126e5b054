from bayesian_inference_tpu.utils.helpers import setup_logging

__all__ = ["setup_logging"]
