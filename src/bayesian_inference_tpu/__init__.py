"""TPU-native Bayesian inference of QCD transport properties.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
jdmulligan/bayesian-inference: design-point table ingest, outlier smoothing,
PCA reduction, Gaussian-process emulation, affine-invariant ensemble MCMC,
closure tests, and qhat(E,T) credible intervals -- with the numerical core
(PCA SVD, GP kernels/Cholesky/LML, MVN likelihood, stretch-move sampler)
running on-chip.
"""

__version__ = "0.1.0"
