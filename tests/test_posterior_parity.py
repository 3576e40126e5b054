"""Posterior parity: the on-chip sampler against an independent numpy
stretch-move implementation, on BOTH an analytic target and the real
GP-emulated posterior from the fixture. This is the statistical equivalent of
the reference's emcee-parity requirement (emcee is not available in this
environment; the numpy sampler implements the same published algorithm)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.stats import ks_2samp

from bayesian_inference_tpu.mcmc.stretch import run_ensemble
from reference_stretch import run_stretch_numpy


def _ks_marginals(c1, c2, thin1=25, thin2=25):
    """KS p-values per marginal, thinning each (steps, walkers, ndim) chain
    along the STEP axis before flattening. Thinning after flattening would be
    walker-major and only decorrelate by thin/n_walkers steps."""
    s1 = c1[::thin1].reshape(-1, c1.shape[-1])
    s2 = c2[::thin2].reshape(-1, c2.shape[-1])
    pvals = []
    for dim in range(s1.shape[1]):
        pvals.append(ks_2samp(s1[:, dim], s2[:, dim]).pvalue)
    return pvals


def test_parity_on_banana_target():
    """Correlated non-Gaussian (mild banana) target: KS parity of all marginals."""

    def log_prob_np(x):
        a, b = x[:, 0], x[:, 1]
        return -0.5 * (a**2 / 4.0 + (b - 0.25 * a**2) ** 2)

    def log_prob_jax(x):
        a, b = x[:, 0], x[:, 1]
        return -0.5 * (a**2 / 4.0 + (b - 0.25 * a**2) ** 2)

    W, n_steps, burn = 64, 8000, 2000
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(W, 2)) * 0.5

    chain_np, _, acc_np = run_stretch_numpy(rng, log_prob_np, x0, n_steps)
    out = run_ensemble(jax.random.key(1), log_prob_jax, jnp.asarray(x0), n_steps)
    chain_jax = np.asarray(out["chain"])
    acc_jax = np.asarray(out["acceptance_fraction"])

    # acceptance fractions agree
    assert abs(acc_np.mean() - acc_jax.mean()) < 0.05, (acc_np.mean(), acc_jax.mean())

    s1 = chain_np[burn:].reshape(-1, 2)
    s2 = chain_jax[burn:].reshape(-1, 2)
    # moments
    np.testing.assert_allclose(s1.mean(axis=0), s2.mean(axis=0), atol=0.15)
    np.testing.assert_allclose(s1.std(axis=0), s2.std(axis=0), rtol=0.1)
    # KS on step-thinned marginals
    for p in _ks_marginals(chain_np[burn:], chain_jax[burn:]):
        assert p > 1e-3, p


@pytest.mark.slow
def test_parity_on_emulated_posterior(tmp_path):
    """Full-stack parity: our on-chip sampler vs the numpy sampler running the
    SAME jitted likelihood, on the fixture-trained emulator posterior."""
    from bayesian_inference_tpu import io
    from bayesian_inference_tpu.mcmc.likelihood import build_likelihood
    from bayesian_inference_tpu.models import emulator
    from bayesian_inference_tpu.pipeline.configs import EmulationConfig, load_yaml
    from conftest import make_analysis_yaml

    config_path, analysis_name, param = make_analysis_yaml(tmp_path)
    analysis_config = load_yaml(config_path)["analyses"][analysis_name]
    emu_config = EmulationConfig.from_config_file(
        analysis_name=analysis_name, parameterization=param,
        config_file=str(config_path), analysis_config=analysis_config,
    )
    emulator.fit_emulators(emu_config, n_opt_iters=30)
    results = emu_config.read_all_emulator_groups()
    exp = io.data_array_from_h5(emu_config.output_dir, "observables.h5",
                                observable_filter=emu_config.observable_filter)
    pspec = analysis_config["parameterization"][param]
    like = build_likelihood(emu_config, results, exp,
                            theta_min=pspec["min"], theta_max=pspec["max"])

    logp_jit = jax.jit(like.log_posterior)

    def log_prob_np(x):
        return np.asarray(logp_jit(jnp.asarray(x)))

    # The numpy oracle steps through a host loop (2 jit calls per step) while
    # the JAX chain is one scan — so the oracle runs a shorter chain and the
    # on-chip chain keeps full length; KS/quantile comparisons below handle
    # the unequal sample sizes.
    # Chain lengths sized for suite runtime: the heavyweight parity evidence
    # (16k steps, 3 seeds, on-device) lives in docs/PARITY.md via
    # scripts/parity_check.py; this test guards the CPU path each run.
    W, n_steps_np, burn_np, n_steps_jax, burn_jax = 32, 2200, 800, 4400, 1100
    rng = np.random.default_rng(2)
    x0 = rng.uniform(pspec["min"], pspec["max"], (W, 6))
    x0 = 0.5 * (x0 + np.mean([pspec["min"], pspec["max"]], axis=0))

    chain_np, _, acc_np = run_stretch_numpy(rng, log_prob_np, x0, n_steps_np)
    out = run_ensemble(jax.random.key(3), like.log_posterior, jnp.asarray(x0), n_steps_jax)
    chain_jax = np.asarray(out["chain"])
    acc_jax = np.asarray(out["acceptance_fraction"])

    assert abs(acc_np.mean() - acc_jax.mean()) < 0.06, (acc_np.mean(), acc_jax.mean())
    s1 = chain_np[burn_np:].reshape(-1, 6)
    s2 = chain_jax[burn_jax:].reshape(-1, 6)

    # The emulated posterior is strongly peaked -> large autocorrelation time;
    # compare quantiles (in prior-width units), and KS on tau-thinned samples.
    from bayesian_inference_tpu.mcmc import stats as mcmc_stats

    prior_width = np.asarray(pspec["max"]) - np.asarray(pspec["min"])
    for q in (0.16, 0.5, 0.84):
        dq = np.abs(np.quantile(s1, q, axis=0) - np.quantile(s2, q, axis=0)) / prior_width
        assert np.all(dq < 0.08), (q, dq)

    tau = max(
        mcmc_stats.integrated_time(chain_np[burn_np:], quiet=True).max(),
        mcmc_stats.integrated_time(chain_jax[burn_jax:], quiet=True).max(),
    )
    thin = max(1, int(np.ceil(tau)))
    pvals = _ks_marginals(chain_np[burn_np:], chain_jax[burn_jax:], thin1=thin, thin2=thin)
    assert sum(p > 1e-3 for p in pvals) >= 5, (pvals, tau)
