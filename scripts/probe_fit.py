"""One-off probe: decompose GP-fit wall time (program load vs exec) on the TPU.

Runs fit_emulators twice in one process with force_retrain: the second call
hits the in-process jit cache, so it measures pure exec + artifact IO.
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
logging.basicConfig(level=logging.WARNING, stream=sys.stderr)

import yaml

from bayesian_inference_tpu.models import emulator
from bayesian_inference_tpu.pipeline.configs import EmulationConfig

workdir = REPO / "output" / "bench_run"
cfg = yaml.safe_load((workdir / "bench.yaml").read_text())
analysis_config = cfg["analyses"]["bench"]

emu_config = EmulationConfig.from_config_file(
    analysis_name="bench", parameterization="exponential",
    config_file=str(workdir / "bench.yaml"), analysis_config=analysis_config,
)

for i in range(3):
    for g in emu_config.emulation_groups_config.values():
        if os.path.exists(g.emulation_outputfile):
            os.remove(g.emulation_outputfile)
    t0 = time.perf_counter()
    emulator.fit_emulators(emu_config, n_opt_iters=int(os.environ.get("BENCH_OPT_ITERS", "60")))
    jax.effects_barrier()
    print(f"fit call {i}: {time.perf_counter() - t0:.2f}s", file=sys.stderr, flush=True)
