"""One-off probe: decompose sampler program overhead (trace vs cache-load vs
exec) on the real TPU. Reuses output/bench_run artifacts from the last bench.

Usage: python scripts/probe_overhead.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "src"))

import jax
import jax.numpy as jnp
import numpy as np
import yaml

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import logging
logging.basicConfig(level=logging.WARNING, stream=sys.stderr)

from bayesian_inference_tpu.io import observables as obs_io
from bayesian_inference_tpu.mcmc.likelihood import build_likelihood
from bayesian_inference_tpu.mcmc.stretch import init_state, run_chunk
from bayesian_inference_tpu.pipeline.configs import EmulationConfig

workdir = REPO / "output" / "bench_run"
config_path = workdir / "bench.yaml"
cfg = yaml.safe_load(config_path.read_text())
analysis_name = "bench"
parameterization = "exponential"
analysis_config = cfg["analyses"][analysis_name]

_t0 = time.perf_counter()
def mark(label):
    global _t0
    t = time.perf_counter()
    print(f"[{t - _t0:8.2f}s] {label}", file=sys.stderr, flush=True)
    _t0 = t

emu_config = EmulationConfig.from_config_file(
    analysis_name=analysis_name, parameterization=parameterization,
    config_file=str(config_path), analysis_config=analysis_config,
)
emulation_results = emu_config.read_all_emulator_groups()
spec = analysis_config["parameterization"][parameterization]
exp = obs_io.data_array_from_h5(
    str(workdir / "output" / f"{analysis_name}_{parameterization}"),
    "observables.h5", observable_filter=emu_config.observable_filter,
)
like = build_likelihood(
    emu_config, emulation_results, exp,
    theta_min=np.asarray(spec["min"], float), theta_max=np.asarray(spec["max"], float),
    mode="block",
)
dt = like.theta_min.dtype
mark("setup + likelihood build")

key = jax.random.key(0)
key, k0 = jax.random.split(key)
x0 = jax.random.uniform(k0, (100, 6), minval=like.theta_min, maxval=like.theta_max, dtype=dt)
fn = like.log_posterior

st = init_state(key, fn, x0)
jax.block_until_ready(st.coords)
mark("init_state (program A first call)")

st, ys = run_chunk(st, fn, 500)
jax.block_until_ready(ys[0])
mark("run_chunk(500) first call")

st, ys = run_chunk(st, fn, 500)
jax.block_until_ready(ys[0])
mark("run_chunk(500) second call (pure exec)")

st, ys = run_chunk(st, fn, 1000)
jax.block_until_ready(ys[0])
mark("run_chunk(1000) first call")

st, ys = run_chunk(st, fn, 1000)
jax.block_until_ready(ys[0])
mark("run_chunk(1000) second call (pure exec)")

# NEW likelihood values, same shapes -> does the jit/persistent cache still hit?
like2 = jax.tree_util.tree_map(
    lambda a: a * (1.0 + 1e-3) if isinstance(a, jax.Array) and jnp.issubdtype(a.dtype, jnp.floating) else a,
    like,
)
fn2 = like2.log_posterior
st2 = init_state(key, fn2, x0)
st2, ys2 = run_chunk(st2, fn2, 1000)
jax.block_until_ready(ys2[0])
mark("run_chunk(1000) with DIFFERENT likelihood values (new closure)")

# back-to-back dispatch of 10 x 1000 then ordered download (production pattern)
pend = []
for _ in range(10):
    st, ys = run_chunk(st, fn, 1000)
    pend.append(ys)
mark("dispatch 10 x run_chunk(1000) (async)")
slabs = [np.asarray(ys[0]) for ys in pend]
mark("download 10 chunks in order")

# single big scan for comparison
st, ys = run_chunk(st, fn, 10000)
jax.block_until_ready(ys[0])
mark("run_chunk(10000) first call")
st, ys = run_chunk(st, fn, 10000)
jax.block_until_ready(ys[0])
mark("run_chunk(10000) second call (pure exec)")
c = np.asarray(ys[0])
mark("download 10000-step chain")
print("done", file=sys.stderr)
