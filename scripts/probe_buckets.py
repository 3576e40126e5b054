"""One-off probe: per-step sampler cost vs observable-block bucket layout.

Times a 5000-step production scan (100 walkers, block likelihood) on the TPU
for each BIQ_BUCKET_LAUNCH_COST setting, at BOTH bench profiles' block-width
spreads, using the bench output artifacts on disk (run bench.py first).
Calibrates mcmc/likelihood.py::_LAUNCH_COST.

Usage: python scripts/probe_buckets.py [fixture|production] [launch_cost ...]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "src"))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import logging

logging.basicConfig(level=logging.WARNING)
import numpy as np
import yaml

profile = sys.argv[1] if len(sys.argv) > 1 else "production"
costs = [float(c) for c in sys.argv[2:]] or [0.0, 16384.0, 1e12]

workdir = REPO / "output" / f"bench_{profile}"
cfg = yaml.safe_load((workdir / "bench.yaml").read_text())

from bayesian_inference_tpu.io import observables as obs_io
from bayesian_inference_tpu.pipeline.configs import EmulationConfig

emu_config = EmulationConfig.from_config_file(
    analysis_name="bench", parameterization="exponential",
    config_file=str(workdir / "bench.yaml"), analysis_config=cfg["analyses"]["bench"],
)
results = emu_config.read_all_emulator_groups()
spec = cfg["analyses"]["bench"]["parameterization"]["exponential"]
exp = obs_io.data_array_from_h5(
    str(workdir / "output" / "bench_exponential"), "observables.h5",
    observable_filter=emu_config.observable_filter,
)

N_STEPS = int(os.environ.get("PROBE_STEPS", "5000"))
W = 100

for cost in costs:
    os.environ["BIQ_BUCKET_LAUNCH_COST"] = str(cost)
    from bayesian_inference_tpu.mcmc.likelihood import build_likelihood
    from bayesian_inference_tpu.mcmc.stretch import init_state, run_chunk

    like = build_likelihood(
        emu_config, results, exp,
        theta_min=np.asarray(spec["min"], float),
        theta_max=np.asarray(spec["max"], float), mode="block",
    )
    layout = [(int(d.shape[1]), int(d.shape[0])) for d in like.D]
    dt = like.theta_min.dtype
    key = jax.random.key(0)
    x0 = jax.random.uniform(key, (W, 6), minval=like.theta_min, maxval=like.theta_max, dtype=dt)

    state = init_state(key, like.log_posterior, x0)
    # warm: one full-length exec (server defers compile to first exec)
    t0 = time.perf_counter()
    s2, ys = run_chunk(state, like.log_posterior, N_STEPS)
    np.asarray(ys[0])
    warm = time.perf_counter() - t0
    # timed (download-inclusive; block_until_ready lies on this backend)
    t0 = time.perf_counter()
    s2, ys = run_chunk(state, like.log_posterior, N_STEPS)
    np.asarray(ys[0])
    dt_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    s2, ys = run_chunk(state, like.log_posterior, N_STEPS)
    np.asarray(ys[0])
    dt_run2 = time.perf_counter() - t0
    best = min(dt_run, dt_run2)
    print(
        f"[{profile}] launch_cost={cost:g}: layout {layout} (nb, count) -> "
        f"{N_STEPS} steps: warm {warm:.2f}s, timed {dt_run:.2f}/{dt_run2:.2f}s "
        f"({N_STEPS / best:.0f} steps/s, {best / N_STEPS * 1e6:.0f} us/step)"
    )
