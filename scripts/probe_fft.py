"""One-off probe: on-device autocorrelation-function cost on the TPU.

Computes the walker-averaged ACF of a (50000, 100, 6) chain with jnp.fft and
compares against the host scipy path for value + wall time.
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

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n_t, n_w, n_d = 50000, 100, 6
n = 1 << (n_t - 1).bit_length()   # 65536


@jax.jit
def acf_mean(chain):
    """Walker-averaged normalized ACF, (n_t, n_d) float32."""
    x = chain - jnp.mean(chain, axis=0)
    x = x.reshape(n_t, n_w * n_d).T  # (series, time): batch FFT over last axis
    f = jnp.fft.rfft(x, n=2 * n, axis=-1)
    acf = jnp.fft.irfft(f * jnp.conj(f), n=2 * n, axis=-1)[:, :n_t]
    acf = acf / acf[:, :1]
    return jnp.mean(acf.reshape(n_w, n_d, n_t), axis=0).T  # (n_t, n_d)


rng = np.random.default_rng(0)
host = rng.standard_normal((n_t, n_w, n_d)).astype(np.float32)
# AR(1)-ify so the ACF isn't trivial
for t in range(1, 400):
    host[t] = 0.9 * host[t - 1] + np.sqrt(1 - 0.81) * host[t]

t0 = time.perf_counter()
chain = jax.device_put(host)
jax.block_until_ready(chain)
print(f"upload: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

t0 = time.perf_counter()
a = acf_mean(chain)
jax.block_until_ready(a)
print(f"acf_mean first call (compile+exec): {time.perf_counter() - t0:.2f}s", file=sys.stderr)

t0 = time.perf_counter()
a = acf_mean(chain)
a_host = np.asarray(a)
print(f"acf_mean second call + download: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

# host reference
from scipy import fft as sfft

t0 = time.perf_counter()
x = (host - host.mean(axis=0)).reshape(n_t, n_w * n_d)
f = sfft.rfft(x, n=2 * n, axis=0, workers=1)
np.multiply(f, np.conjugate(f), out=f)
acf = sfft.irfft(f, n=2 * n, axis=0, workers=1)[:n_t].reshape(n_t, n_w, n_d)
acf = acf / acf[0]
ref = acf.mean(axis=1)
print(f"host scipy path: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

err = np.max(np.abs(a_host - ref)) / np.max(np.abs(ref))
tau_dev = 2 * np.cumsum(a_host.astype(np.float64), axis=0) - 1
tau_ref = 2 * np.cumsum(ref.astype(np.float64), axis=0) - 1
print(f"max rel acf err: {err:.2e}; tau@5000 dev={tau_dev[5000]}, ref={tau_ref[5000]}", file=sys.stderr)
