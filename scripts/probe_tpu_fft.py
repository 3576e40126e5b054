"""One-off probe: on-device walker power-spectrum cost for the ACF.

The autocorrelation phase runs on the 1-vCPU host today and suffers
CPU-steal variance (2-30 s for identical work). The candidate fix computes
the per-walker power spectra on the TPU (chain already on device after
production) and downloads only the (nfft/2+1, n_d) walker-averaged spectrum.
This times, as one jitted program each:
  1. rfft of the centered/normalized chain (nfft pow2) + |.|^2 walker mean
  2. the same from a raw (n_t, W, d) chain operand (centering+norm fused)
at the production shape (50k steps x 100 walkers x 6 params), plus the
download. Timings are download-inclusive (block_until_ready is unreliable
through the tunnel — CLAUDE.md).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "src"))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

N_T, W, D = 50_000, 100, 6
L = 6_656          # lag cap at the production tau scale
NFFT = 65_536      # pow2 >= n_t + L - 1 (TPU FFT wants pow2)

rng = np.random.default_rng(0)
# AR(1)-ish series so the spectrum is non-trivial
x = rng.normal(size=(N_T, W * D)).astype(np.float32)
for t in range(1, 8):
    x[t] += 0.9 * x[t - 1]
chain = jax.device_put(x)


@jax.jit
def spectrum_from_raw(c):
    xc = c - jnp.mean(c, axis=0, keepdims=True)
    norm = jnp.sqrt(jnp.einsum("tj,tj->j", xc, xc))
    xc = xc / jnp.where(norm == 0.0, 1.0, norm)
    f = jnp.fft.rfft(xc, n=NFFT, axis=0)
    pw = jnp.real(f) ** 2 + jnp.imag(f) ** 2
    return jnp.mean(pw.reshape(-1, W, D), axis=1)  # (NFFT//2+1, D)


for name, fn, arg in [("fused center+rfft+|.|^2+walkermean", spectrum_from_raw, chain)]:
    out = np.asarray(fn(arg))  # compile + first exec
    t0 = time.perf_counter()
    out = np.asarray(fn(arg))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt:.3f}s (out {out.shape} {out.dtype})", flush=True)

# Host reference for the same work (scipy, current implementation's shape)
from scipy import fft as sfft

t0 = time.perf_counter()
xc = x - x.mean(axis=0)
norm = np.sqrt(np.einsum("tj,tj->j", xc, xc))
xc *= 1.0 / np.where(norm == 0.0, 1.0, norm)
f = sfft.rfft(xc, n=sfft.next_fast_len(N_T + L - 1, real=True), axis=0, workers=1)
sq = np.square(f.view(np.float32))
pw = sq.reshape(len(f), W, D, 2).sum(axis=(1, 3), dtype=np.float64) / W
dt = time.perf_counter() - t0
print(f"host scipy same pipeline: {dt:.3f}s", flush=True)
