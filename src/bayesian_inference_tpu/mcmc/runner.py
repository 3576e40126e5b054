"""MCMC orchestration: burn-in with top-likelihood walker resampling, on-chip
production run, artifact output (reference run_mcmc, mcmc.py:34-134).

The whole production chain is one lax.scan launch; the only host round trips
are at the two burn-in boundaries (matching the reference's resampling logic,
mcmc.py:93-103) and the final chain download.
"""

from __future__ import annotations

import logging
import pickle
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from bayesian_inference_tpu.io import hdf5, observables as obs_io
from bayesian_inference_tpu.mcmc import stats
from bayesian_inference_tpu.mcmc.likelihood import build_likelihood
from bayesian_inference_tpu.mcmc.stretch import run_ensemble
from bayesian_inference_tpu.pipeline.configs import EmulationConfig, MCMCConfig

logger = logging.getLogger(__name__)


def resample_walkers_to_top_positions(
    chain: np.ndarray, log_prob: np.ndarray, n_walkers: int
) -> np.ndarray:
    """Reposition walkers at the top-likelihood unique points of a burn-in chain.

    Matches the reference (mcmc.py:99): flatten, unique log-prob values sorted
    ascending, take the positions of the last n_walkers.
    """
    flat_chain = chain.reshape(-1, chain.shape[-1])
    flat_logp = log_prob.reshape(-1)
    _, unique_idx = np.unique(flat_logp, return_index=True)
    return flat_chain[unique_idx[-n_walkers:]]


def run_mcmc(
    config: MCMCConfig,
    closure_index: int = -1,
    seed: int = 0,
    mode: str | None = None,
    dtype=None,
    checkpoint_every: int | None = None,
    mesh=None,
) -> dict[str, Any]:
    """Run the full MCMC for one analysis; writes mcmc.h5 + sampler state pickle.

    ``checkpoint_every``: production-phase checkpoint cadence in steps. When
    set, a resumable snapshot (walker coords, RNG key, chain-so-far) is written
    to mcmc_checkpoint.pkl after each chunk, and an interrupted run restarts
    from the latest snapshot instead of from scratch — step-granular resume the
    reference lists as an open TODO (mcmc.py:69-70). Costs one device dispatch
    per chunk; leave None for the single-dispatch fast path.

    ``mesh``: a jax.sharding.Mesh to shard the per-walker likelihood batch
    across chips (parallel/mesh.py); None runs single-device.
    """
    if mode is None:
        mode = getattr(config, "likelihood_mode", "block")
    param_spec = config.parameterization_spec()
    theta_min = np.asarray(param_spec["min"], float)
    theta_max = np.asarray(param_spec["max"], float)
    ndim = len(param_spec["names"])

    import time as _time

    _t = _time.perf_counter()
    emulation_config = EmulationConfig.from_config_file(
        analysis_name=config.analysis_name,
        parameterization=config.parameterization,
        analysis_config=config.analysis_config,
        config_file=config.config_file,
    )
    emulation_results = emulation_config.read_all_emulator_groups()
    logger.info(f"emulator artifacts loaded: {_time.perf_counter() - _t:.2f}s")

    experimental_results = obs_io.data_array_from_h5(
        config.output_dir,
        "observables.h5",
        pseudodata_index=closure_index,
        observable_filter=emulation_config.observable_filter,
        rng=np.random.default_rng(seed + 12345) if closure_index >= 0 else None,
    )

    _t = _time.perf_counter()
    like = build_likelihood(
        emulation_config,
        emulation_results,
        experimental_results,
        theta_min=theta_min,
        theta_max=theta_max,
        mode=mode,
        dtype=dtype,
    )
    logger.info(f"likelihood build: {_time.perf_counter() - _t:.2f}s")
    if mesh is not None:
        from bayesian_inference_tpu.parallel.mesh import make_sharded_log_prob

        log_prob_fn = make_sharded_log_prob(like.log_posterior, mesh)
        logger.info(f"walker batch sharded over {mesh.devices.size} devices")
    else:
        log_prob_fn = like.log_posterior
    dt = like.theta_min.dtype

    key = jax.random.key(seed)
    key, k_init = jax.random.split(key)
    x0 = jax.random.uniform(
        k_init, (config.n_walkers, ndim), minval=like.theta_min, maxval=like.theta_max, dtype=dt
    )

    # One dispatch per phase: device dispatch round trips dominate at small
    # chunk sizes (the chain buffer fits HBM easily), and the persistent
    # compilation cache absorbs the per-program compile cost across runs.
    nburn0 = config.n_burn_steps // 2
    nburn1 = config.n_burn_steps - nburn0
    chunk = None


    # --- burn-in phase 1 -------------------------------------------------------
    logger.info(f"Burn-in phase 1: {config.n_walkers} walkers x {nburn0} steps")
    _t = _time.perf_counter()
    key, k1 = jax.random.split(key)
    out1 = run_ensemble(k1, log_prob_fn, x0, nburn0, chunk_size=chunk)
    jax.block_until_ready(out1["coords"])
    logger.info(f"burn-1 dispatch+exec: {_time.perf_counter() - _t:.2f}s")

    # --- reposition walkers at top-likelihood points (host, reference parity) ---
    x_top = resample_walkers_to_top_positions(
        np.asarray(out1["chain"]), np.asarray(out1["log_prob"]), config.n_walkers
    )
    logger.info("Resampled walker positions; burn-in phase 2")

    _t = _time.perf_counter()
    key, k2 = jax.random.split(key)
    out2 = run_ensemble(k2, log_prob_fn, jnp.asarray(x_top, dt), nburn1, chunk_size=chunk)
    jax.block_until_ready(out2["coords"])
    logger.info(f"burn-2 dispatch+exec: {_time.perf_counter() - _t:.2f}s")

    # --- production -------------------------------------------------------------
    logger.info(f"Production: {config.n_sampling_steps} steps")
    _t = _time.perf_counter()
    key, k3 = jax.random.split(key)
    if checkpoint_every:
        out3 = _run_production_with_checkpoints(
            config, k3, log_prob_fn, out2["coords"], checkpoint_every
        )
    else:
        out3 = run_ensemble(k3, log_prob_fn, out2["coords"], config.n_sampling_steps, chunk_size=chunk)
    jax.block_until_ready(out3["coords"])
    logger.info(f"production dispatch+exec: {_time.perf_counter() - _t:.2f}s")

    _t = _time.perf_counter()
    chain = np.asarray(out3["chain"])
    log_prob = np.asarray(out3["log_prob"])
    acceptance_fraction = np.asarray(out3["acceptance_fraction"])
    logger.info(f"chain download ({chain.nbytes / 1e6:.0f} MB): {_time.perf_counter() - _t:.2f}s")
    af = acceptance_fraction
    logger.info(
        f"acceptance fraction: mean {af.mean():.3f}, std {af.std():.3f}, min {af.min():.3f}, max {af.max():.3f}"
    )

    output_dict: dict[str, Any] = {
        "chain": chain,
        "acceptance_fraction": acceptance_fraction,
        "log_prob": log_prob,
    }
    _t = _time.perf_counter()
    try:
        output_dict["autocorrelation_time"] = stats.integrated_time(chain)
    except stats.AutocorrError as e:
        output_dict["autocorrelation_time"] = None
        logger.info(f"Could not compute autocorrelation time: {e}")
    logger.info(f"autocorrelation estimate: {_time.perf_counter() - _t:.2f}s")

    if closure_index >= 0:
        design_point = obs_io.design_array_from_h5(
            config.output_dir, "observables.h5", validation_set=True
        )[closure_index]
        output_dict["design_point"] = design_point
        output_dict["experimental_pseudodata"] = experimental_results

    hdf5.write_dict_to_h5(output_dict, config.mcmc_output_dir, "mcmc.h5", verbose=True)

    sampler_state = {
        "final_coords": np.asarray(out3["coords"]),
        "final_log_prob": np.asarray(out3["final_log_prob"]),
        "n_walkers": config.n_walkers,
        "ndim": ndim,
        "seed": seed,
        "mode": mode,
    }
    os.makedirs(config.mcmc_output_dir, exist_ok=True)
    with open(config.sampler_outputfile, "wb") as f:
        pickle.dump(sampler_state, f)

    return output_dict


def _checkpoint_path(config: MCMCConfig) -> str:
    return os.path.join(config.mcmc_output_dir, "mcmc_checkpoint.pkl")


def _run_production_with_checkpoints(
    config: MCMCConfig,
    key,
    log_prob_fn,
    x0,
    checkpoint_every: int,
) -> dict[str, Any]:
    """Chunked production with resumable snapshots after every chunk."""
    from bayesian_inference_tpu.mcmc.stretch import init_state, run_chunk

    n_total = config.n_sampling_steps
    path = _checkpoint_path(config)

    chains: list[np.ndarray] = []
    logps: list[np.ndarray] = []
    n_accepted = np.zeros(x0.shape[0], np.int64)
    steps_done = 0

    if os.path.exists(path):
        with open(path, "rb") as f:
            ck = pickle.load(f)
        if ck["n_total"] == n_total and ck["steps_done"] < n_total:
            logger.info(f"Resuming production from checkpoint at step {ck['steps_done']}")
            chains, logps = list(ck["chains"]), list(ck["logps"])
            n_accepted = ck["n_accepted"]
            steps_done = ck["steps_done"]
            x0 = jnp.asarray(ck["coords"])
            key = jax.random.wrap_key_data(ck["key_data"])

    state = init_state(key, log_prob_fn, x0)
    while steps_done < n_total:
        n = min(checkpoint_every, n_total - steps_done)
        state, ys = run_chunk(state, log_prob_fn, n)
        chains.append(np.asarray(ys[0]))
        logps.append(np.asarray(ys[1]))
        steps_done += n
        n_accepted = n_accepted + np.asarray(state.n_accepted, np.int64)
        state = state._replace(n_accepted=jnp.zeros_like(state.n_accepted))
        os.makedirs(config.mcmc_output_dir, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump({
                "n_total": n_total,
                "steps_done": steps_done,
                "chains": chains,
                "logps": logps,
                "n_accepted": n_accepted,
                "coords": np.asarray(state.coords),
                "key_data": np.asarray(jax.random.key_data(state.key)),
            }, f)
        logger.info(f"checkpoint written at step {steps_done}/{n_total}")

    os.remove(path)
    chain = np.concatenate(chains, axis=0)
    return {
        "coords": state.coords,
        "final_log_prob": state.log_prob,
        "acceptance_fraction": n_accepted.astype(float) / n_total,
        "chain": chain,
        "log_prob": np.concatenate(logps, axis=0),
        "key": state.key,
    }
