"""One-off probe: decompose the GP-fit per-iteration device cost on the TPU.

The fit's stage-1 batch is (n_pc * (n_restarts+1)) * len(spec.trial_steps)
value_and_grad evaluations of the LML per L-BFGS iteration. This times, as
separate jitted programs at the production batch shape:
  1. gram assembly only (train_gram_from_sqdiff; transcendental-heavy VPU)
  2. batched cholesky only (fixed PSD inputs; XLA's blocked factorization)
  3. cholesky + cho_solve + logdet (the linear-algebra tail)
  4. the full LML value_and_grad (what an iteration actually runs)
all under the exploration stage's reduced matmul precision, scanned
ITERS times inside one program so per-iteration cost >> dispatch overhead.
All device arrays are runtime operands (closure-captured arrays are baked
into the HLO on this backend — see CLAUDE.md).
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

from bayesian_inference_tpu.models.gp import log_marginal_likelihood_sqdiff
from bayesian_inference_tpu.ops.gram import (
    KernelConfig, KernelParams, pairwise_sqdiff, train_gram_from_sqdiff,
)

B = 4182          # 41 PCs x 51 restarts x 2 trial steps (stage-1 batch)
N, D = 200, 6
ITERS = 5
cfg = KernelConfig(nu=1.5, with_noise=True, with_constant=False)

rng = np.random.default_rng(0)
X = rng.uniform(-1.0, 1.0, (N, D)).astype(np.float32)
D2_h = np.asarray(pairwise_sqdiff(jnp.asarray(X)))  # tiny; host round-trip fine
D2 = jax.device_put(D2_h)
y = jax.device_put(rng.normal(size=(B, N)).astype(np.float32))
log_ls = jax.device_put(rng.uniform(-0.5, 1.5, (B, D)).astype(np.float32))
log_noise = jax.device_put(rng.uniform(-2.0, -0.5, (B,)).astype(np.float32))


def params_of(ls, noise):
    return KernelParams(log_length_scale=ls, log_noise=noise,
                        log_constant=jnp.zeros((), ls.dtype))


def gram_batch(d2, ls, noise):
    return jax.vmap(
        lambda l, s: train_gram_from_sqdiff(cfg, params_of(l, s), d2, 1e-10)
    )(ls, noise)


def scanned(f):
    """jit(operands -> f applied ITERS times with a carry-dependent nudge)."""
    def run(s0, *ops):
        def body(carry, _):
            r = f(carry, *ops)
            return carry + 0.0 * r, r
        _, rs = jax.lax.scan(body, s0, None, length=ITERS)
        return rs[-1]
    return jax.jit(run)


with jax.default_matmul_precision("default"):
    K0 = jax.jit(gram_batch)(D2, log_ls, log_noise)
    K0.block_until_ready()

    progs = {}
    progs["gram"] = (
        scanned(lambda s, d2, ls, ns: jnp.sum(gram_batch(d2, ls + s * 1e-9, ns))),
        (D2, log_ls, log_noise),
    )
    progs["chol"] = (
        scanned(lambda s, k: jnp.sum(jnp.log(jnp.diagonal(
            jnp.linalg.cholesky(k + s * 1e-12 * jnp.eye(N)),
            axis1=-2, axis2=-1)))),
        (K0,),
    )

    def chol_solve(s, k, yy):
        L = jnp.linalg.cholesky(k + s * 1e-12 * jnp.eye(N))
        a = jax.vmap(lambda Li, yi: jax.scipy.linalg.cho_solve((Li, True), yi))(L, yy)
        return jnp.sum(jnp.einsum("bn,bn->b", yy, a)) + jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))
    progs["chol+solve"] = (scanned(chol_solve), (K0, y))

    def lml_vg(s, d2, ls, ns, yy):
        def obj(l, n):
            f = jax.vmap(
                lambda li, ni, yi: log_marginal_likelihood_sqdiff(
                    cfg, params_of(li, ni), d2, yi, 1e-10)
            )(l, n, yy)
            return jnp.sum(f)
        v, g = jax.value_and_grad(obj, argnums=(0, 1))(ls + s * 1e-9, ns)
        return v + jnp.sum(g[0]) + jnp.sum(g[1])
    progs["lml value_and_grad"] = (scanned(lml_vg), (D2, log_ls, log_noise, y))

    for name, (p, ops) in progs.items():
        s0 = jnp.zeros(())
        np.asarray(p(s0, *ops))  # compile + first exec (server defers compile)
        t0 = time.perf_counter()
        np.asarray(p(s0, *ops))
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.3f}s total, {dt / ITERS * 1e3:.1f} ms/iter (B={B})",
              flush=True)
