"""North-star benchmark (BASELINE.json): GP hyperparameter fit + 50,000-step /
100-walker ensemble MCMC with the full GP-emulated Gaussian likelihood, on one
TPU chip. Target: < 60 s wall-clock (the reference runs the same sampling
workload across a 20-core node via emcee + multiprocessing).

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 60/seconds}

Configuration mirrors the production jet_substructure analysis's COMPUTE
scale: three emulation groups with n_pc = 5 / 11 / 25 (41 GPs total, the
production per-group PC counts), Matern-1.5 + white noise kernels, 50
optimizer restarts per PC, 1,000 burn-in + 50,000 production steps, (200, 6)
design. Scope note: the DATA come from the bundled real fixture (16
observables / 215 features) rather than the full production table set (a few
hundred observables); per-walker likelihood cost scales with the number of
observable blocks, so full-production data would add roughly 2-4x to the
per-step likelihood (still block-parallel on-chip). The GP fit (matched:
41 PCs x 51 restarts x (200,6)) and sampler-step counts are at full
production scale. Runs fp32 on TPU; posterior parity vs the x64 CPU path is
covered in tests/ and by scripts/parity_check.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent
sys.path.insert(0, str(REPO / "src"))

import jax
import jax.numpy as jnp
import numpy as np
import yaml

# Persistent compilation cache: repeat bench runs skip XLA compilation.
# jax is pre-imported by the environment's sitecustomize, so env vars are too
# late — set the config directly.
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import logging

logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(name)s: %(message)s")

N_WALKERS = int(os.environ.get("BENCH_WALKERS", "100"))
N_BURN = int(os.environ.get("BENCH_BURN", "1000"))
N_STEPS = int(os.environ.get("BENCH_STEPS", "50000"))
N_RESTARTS = int(os.environ.get("BENCH_RESTARTS", "50"))
N_OPT_ITERS = int(os.environ.get("BENCH_OPT_ITERS", "60"))

_EXP_MIN = [0.1, 1, 0.006737946999085467, 0.006737946999085467, 0, 0.049787068367863944]
_EXP_MAX = [0.5, 10, 10, 10, 1.5, 100]

GROUPS = {
    "jet_like_group": {"n_pc": 5, "observable_list": ["pt_ch_alice", "pt_ch_star"]},
    "mid_group": {"n_pc": 11, "observable_list": ["pt_ch_atlas", "pt_ch_cms"]},
    "large_group": {"n_pc": 25, "observable_list": ["pt_pi"]},
}


def _make_config(workdir: Path) -> tuple[Path, str, str, dict]:
    analysis_name, parameterization = "bench", "exponential"
    emulators = {
        name: {
            "force_retrain": True,
            "n_pc": g["n_pc"],
            "max_n_components_to_calculate": 30,
            "kernels": {
                "active": ["matern", "noise"],
                "matern": {"nu": 1.5, "length_scale_bounds_factor": [0.01, 100]},
                "noise": {"type": "white", "args": {"noise_level": 0.25, "noise_level_bounds": [0.0001, 1]}},
            },
            "GPR": {"n_restarts": N_RESTARTS, "alpha": 1.0e-6},
            "observable_list": g["observable_list"],
        }
        for name, g in GROUPS.items()
    }
    analysis_config = {
        "parameterizations": [parameterization],
        "sqrts_list": [200, 2760, 5020],
        "centrality_range": [0, 10],
        "parameterization": {
            parameterization: {
                "names": ["alpha_s", "Q0", "c_1", "c_2", "tau_0", "c_3"],
                "min": _EXP_MIN,
                "max": _EXP_MAX,
            }
        },
        "validation_indices": [200, 230],
        "parameters": {
            "emulators": emulators,
            "mcmc": {
                "n_walkers": N_WALKERS,
                "n_burn_steps": N_BURN,
                "n_sampling_steps": N_STEPS,
                "n_logging_steps": 1000,
            },
        },
    }
    config = {
        "output_dir": str(workdir / "output"),
        "initialize_observables": False,
        "preprocess_input_data": False,
        "fit_emulators": True,
        "run_mcmc": True,
        "run_closure_tests": False,
        "plot": {},
        "observable_table_dir": str(REPO / "tests" / "test_data" / "tables"),
        "observable_config_dir": str(REPO / "tests" / "test_data"),
        "observables_filename": "observables.h5",
        "analyses": {analysis_name: analysis_config},
    }
    path = workdir / "bench.yaml"
    path.write_text(yaml.safe_dump(config))
    run_dir = workdir / "output" / f"{analysis_name}_{parameterization}"
    run_dir.mkdir(parents=True, exist_ok=True)
    shutil.copy(REPO / "tests" / "test_data" / "observables.h5", run_dir / "observables.h5")
    return path, analysis_name, parameterization, analysis_config


def main() -> None:
    from bayesian_inference_tpu.models import emulator
    from bayesian_inference_tpu.mcmc.programs import prewarm_sampler_programs
    from bayesian_inference_tpu.mcmc.runner import run_mcmc
    from bayesian_inference_tpu.pipeline.configs import EmulationConfig, MCMCConfig

    workdir = REPO / "output" / "bench_run"
    if workdir.exists():
        shutil.rmtree(workdir)
    workdir.mkdir(parents=True)
    config_path, analysis_name, parameterization, analysis_config = _make_config(workdir)

    dev = jax.devices()[0]
    print(f"# bench device: {dev} platform={dev.platform}", file=sys.stderr)

    emu_config = EmulationConfig.from_config_file(
        analysis_name=analysis_name,
        parameterization=parameterization,
        config_file=str(config_path),
        analysis_config=analysis_config,
    )
    mcmc_config = MCMCConfig(
        analysis_name=analysis_name,
        parameterization=parameterization,
        analysis_config=analysis_config,
        config_file=str(config_path),
    )

    t0 = time.perf_counter()
    # NOTE: do NOT prewarm the sampler programs on a thread concurrent with
    # the fit — concurrent compile+execute through the tunneled TPU runtime
    # crashed the worker (measured 2026-08-16) and slowed the fit ~2x even
    # when it survived. run_mcmc compiles inline (~5 s warm: the operand-style
    # programs are value-independent, so the persistent cache always hits).
    programs = None
    if os.environ.get("BENCH_PREWARM", "0") == "1":
        programs = prewarm_sampler_programs(mcmc_config)
    emulator.fit_emulators(emu_config, n_opt_iters=N_OPT_ITERS)
    jax.effects_barrier()
    t_fit = time.perf_counter() - t0
    print(f"# GP fit ({sum(g['n_pc'] for g in GROUPS.values())} PCs x {N_RESTARTS + 1} restarts): {t_fit:.2f}s", file=sys.stderr)

    t1 = time.perf_counter()
    out = run_mcmc(mcmc_config, seed=0, programs=programs)
    t_mcmc = time.perf_counter() - t1

    af = float(np.mean(out["acceptance_fraction"]))
    steps_per_s = N_STEPS / t_mcmc
    print(
        f"# MCMC ({N_WALKERS} walkers x {N_BURN}+{N_STEPS} steps): {t_mcmc:.2f}s"
        f" ({steps_per_s:.0f} steps/s), acceptance={af:.3f}",
        file=sys.stderr,
    )

    total = t_fit + t_mcmc
    print(json.dumps({
        "metric": "gp_fit_plus_50k_step_100_walker_mcmc_walltime",
        "value": round(total, 3),
        "unit": "s",
        "vs_baseline": round(60.0 / total, 3),
    }))


if __name__ == "__main__":
    main()
