"""TPU-native Bayesian inference of QCD transport properties.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
jdmulligan/bayesian-inference: design-point table ingest, outlier smoothing,
PCA reduction, Gaussian-process emulation, affine-invariant ensemble MCMC,
closure tests, and qhat(E,T) credible intervals -- with the numerical core
(PCA SVD, GP kernels/Cholesky/LML, MVN likelihood, stretch-move sampler)
running on-chip.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# TPU MXU matmuls default to bfloat16 passes for float32 inputs. For this
# workload that is catastrophic, not cosmetic: the covariance-block assembly
# einsums pick up ~1e-3 absolute noise, flipping marginally-positive-definite
# blocks negative (NaN Cholesky) and roughening the log-posterior surface
# enough to collapse MCMC acceptance. Force full float32 precision throughout;
# opt out with BIQ_MATMUL_PRECISION=default if a future workload wants speed
# over exactness.
_precision = _os.environ.get("BIQ_MATMUL_PRECISION", "high")
if _precision != "default":
    # "high" (three bf16 passes) recovers ~float32 accuracy at ~2x the cost of
    # a single pass — sufficient for positive-definite covariance assembly.
    # "highest" (six passes) is available for paranoia via the env var.
    _jax.config.update("jax_default_matmul_precision", _precision)
