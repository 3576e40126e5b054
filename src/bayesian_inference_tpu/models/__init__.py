from bayesian_inference_tpu.models.pca import PCAState, fit_pca

__all__ = ["PCAState", "fit_pca"]
