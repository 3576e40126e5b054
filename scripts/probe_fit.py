"""One-off probe: decompose the GP-fit cost on the TPU.

The fused fit (models/gp_fit.py) spends its time in the vmapped LML
value_and_grad: gram build (elementwise from shared sqdiff) + batched
Cholesky forward + Cholesky backward (triangular solves). This times each
piece at the production fit batch shape (k*R instances, N design points) to
decide whether a Pallas blocked-Cholesky (+custom VJP) is worth building.

Usage: python scripts/probe_fit.py [B] [N]   (defaults 2091 200)
"""
from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "src"))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import logging

logging.basicConfig(level=logging.WARNING)
import jax.numpy as jnp
import numpy as np

from bayesian_inference_tpu.models.gp import log_marginal_likelihood_sqdiff
from bayesian_inference_tpu.ops.gram import (
    KernelConfig,
    KernelParams,
    pairwise_sqdiff,
    train_gram_from_sqdiff,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2091
N = int(sys.argv[2]) if len(sys.argv) > 2 else 200
d = 6
cfg = KernelConfig(nu=1.5, with_noise=True)

rng = np.random.default_rng(0)
X = rng.uniform(0.0, 1.0, (N, d)).astype(np.float32)
D2 = jnp.asarray(pairwise_sqdiff(jnp.asarray(X)))
y = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
log_ls = jnp.asarray(rng.uniform(-1.0, 1.0, (B, d)).astype(np.float32))
log_noise = jnp.asarray(rng.uniform(-2.0, -1.0, (B,)).astype(np.float32))


def params_of(i):
    return KernelParams(
        log_length_scale=log_ls[i], log_noise=log_noise[i], log_constant=jnp.zeros((), jnp.float32)
    )


params = jax.vmap(params_of)(jnp.arange(B))


@jax.jit
def gram_only(params):
    K = jax.vmap(lambda p: train_gram_from_sqdiff(cfg, p, D2, 1e-6))(params)
    return jnp.sum(K)


@jax.jit
def gram_plus_chol(params):
    K = jax.vmap(lambda p: train_gram_from_sqdiff(cfg, p, D2, 1e-6))(params)
    L = jnp.linalg.cholesky(K)
    return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))


def _lml(p, yy):
    return log_marginal_likelihood_sqdiff(cfg, p, D2, yy, 1e-6)


@jax.jit
def lml_value(params, y):
    return jnp.sum(jax.vmap(_lml)(params, y))


@jax.jit
def lml_value_and_grad(params, y):
    vals, grads = jax.vmap(jax.value_and_grad(_lml))(params, y)
    return jnp.sum(vals), jax.tree.map(jnp.sum, grads)


def timed(tag, fn, *args, reps=3):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)  # warm (compile + first exec)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda x: np.asarray(x), out)
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: median {np.median(ts)*1e3:.1f} ms (min {min(ts)*1e3:.1f})", file=sys.stderr)
    return np.median(ts)


print(f"# probe_fit: B={B} N={N} on {jax.devices()[0]}", file=sys.stderr)
t_gram = timed("gram build only", gram_only, params)
t_chol = timed("gram + cholesky fwd", gram_plus_chol, params)
t_val = timed("full LML value", lml_value, params, y)
t_vg = timed("full LML value+grad", lml_value_and_grad, params, y)
chol_flops = B * N**3 / 3
print(
    f"# chol fwd ~{(t_chol - t_gram)*1e3:.1f} ms -> "
    f"{chol_flops / max(t_chol - t_gram, 1e-9) / 1e9:.0f} GFLOP/s; "
    f"backward adds {(t_vg - t_val)*1e3:.1f} ms",
    file=sys.stderr,
)

# --- matmul-path (blocked factorization + closed-form grad) precision A/B ---
# BIQ_PROBE_FIT_MM=1 times the TPU fit path's value+grad at HIGHEST and HIGH
# panel/einsum precision (GPFitSpec.explore_precision decision input) and
# cross-checks the HIGH grads against HIGHEST (basin-selection fidelity).
import os as _os

if _os.environ.get("BIQ_PROBE_FIT_MM", ""):
    from bayesian_inference_tpu.models.gp import log_marginal_likelihood_matmul

    def _mm_vg(prec):
        def _lml_mm(p, yy):
            return log_marginal_likelihood_matmul(cfg, p, D2, yy, 1e-6, prec)

        @jax.jit
        def f(params, y):
            vals, grads = jax.vmap(jax.value_and_grad(_lml_mm))(params, y)
            return vals, grads

        return f

    from bayesian_inference_tpu.ops.blocked_cholesky import NB, chol_inv_batched

    @jax.jit
    def mm_chol_only(params):
        K = jax.vmap(lambda p: train_gram_from_sqdiff(cfg, p, D2, 1e-6))(params)
        invL, hld = chol_inv_batched(K)
        return jnp.sum(hld) + jnp.sum(invL)

    timed(f"gram + blocked chol_inv (NB={NB})", mm_chol_only, params)

    @jax.jit
    def mm_value_only(params, y):
        vals = jax.vmap(
            lambda p, yy: log_marginal_likelihood_matmul(cfg, p, D2, yy, 1e-6)
        )(params, y)
        return jnp.sum(vals)

    timed("matmul LML value only (fwd)", mm_value_only, params, y)

    # The backward's recomputed scaled-sqdist einsum + Matern sqrt/exp chain
    # (_lml_matmul_bwd lines computing sq and _dK_dsq), in isolation — the
    # piece a dK-residual cache would delete.
    from bayesian_inference_tpu.models.gp import _dK_dsq

    @jax.jit
    def bwd_transcendental(params):
        def one(p):
            w = jnp.exp(-2.0 * p.log_length_scale)
            sq = jnp.einsum("ijk,k->ij", D2, w)
            return jnp.sum(_dK_dsq(cfg, sq))

        return jnp.sum(jax.vmap(one)(params))

    timed("bwd sq-einsum + dK/dsq chain", bwd_transcendental, params)

    # The backward's two remaining dense pieces, isolated on synthetic
    # operands of the right shapes: Kinv = invL^T invL, and the
    # H-assembly + d_log_ls contraction against D2.
    invL_s = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))

    @jax.jit
    def bwd_kinv_only(invL):
        Kinv = jnp.einsum(
            "bki,bkj->bij", invL, invL, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.sum(Kinv)

    timed("bwd Kinv einsum (HIGHEST)", bwd_kinv_only, invL_s)

    G_s = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))
    DK_s = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))

    @jax.jit
    def bwd_dls_only(G, DK):
        H = G * DK
        return jnp.einsum(
            "bij,ijk->bk", H, D2, precision=jax.lax.Precision.HIGHEST
        ).sum()

    timed("bwd H*einsum(D2) only", bwd_dls_only, G_s, DK_s)
    f_hi = _mm_vg(jax.lax.Precision.HIGHEST)
    f_lo = _mm_vg(jax.lax.Precision.HIGH)
    timed(f"matmul LML value+grad (HIGHEST, NB={NB})", f_hi, params, y)
    timed("matmul LML value+grad (HIGH)", f_lo, params, y)
    v_hi, g_hi = jax.tree.map(np.asarray, f_hi(params, y))
    v_lo, g_lo = jax.tree.map(np.asarray, f_lo(params, y))
    gh = np.concatenate([g_hi.log_length_scale.ravel(), g_hi.log_noise.ravel()])
    gl = np.concatenate([g_lo.log_length_scale.ravel(), g_lo.log_noise.ravel()])
    denom = np.maximum(np.abs(gh), 1e-6)
    print(
        f"# HIGH vs HIGHEST: |dLML| max {np.abs(v_lo - v_hi).max():.3e} "
        f"(rel {np.abs((v_lo - v_hi) / np.maximum(np.abs(v_hi), 1.0)).max():.2e}); "
        f"grad rel-err max {np.abs((gl - gh) / denom).max():.2e} "
        f"median {np.median(np.abs((gl - gh) / denom)):.2e}",
        file=sys.stderr,
    )
