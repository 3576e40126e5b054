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

    # Alternative formulations of the same contraction — is the einsum
    # spelling (not the arithmetic) the cost? bki,bkj->bij at B=2091 N=200
    # is 33 GFLOP; 24.8 ms = 1.3 TFLOP/s, ~2% of the chip.
    @jax.jit
    def bwd_kinv_matmul(invL):
        Kinv = jnp.matmul(
            jnp.swapaxes(invL, -1, -2), invL, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.sum(Kinv)

    timed("bwd Kinv batched matmul (HIGHEST)", bwd_kinv_matmul, invL_s)

    for prec in ("HIGH", "DEFAULT"):
        p = getattr(jax.lax.Precision, prec)

        @jax.jit
        def bwd_kinv_p(invL, p=p):
            return jnp.sum(jnp.einsum("bki,bkj->bij", invL, invL, precision=p))

        timed(f"bwd Kinv einsum ({prec})", bwd_kinv_p, invL_s)

    G_s = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))
    DK_s = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))

    @jax.jit
    def bwd_dls_only(G, DK):
        H = G * DK
        return jnp.einsum(
            "bij,ijk->bk", H, D2, precision=jax.lax.Precision.HIGHEST
        ).sum()

    timed("bwd H*einsum(D2) only", bwd_dls_only, G_s, DK_s)

    # Same contraction as one (B, N*N) x (N*N, d) dot — sum_ij H_ij D2_ijk
    # is a plain matmul over the flattened ij axis; does spelling it that
    # way beat the bij,ijk->bk einsum lowering?
    @jax.jit
    def bwd_dls_reshaped(G, DK):
        H = (G * DK).reshape(G.shape[0], -1)                  # (B, N*N)
        D2f = D2.reshape(-1, D2.shape[-1])                    # (N*N, d)
        return jnp.dot(H, D2f, precision=jax.lax.Precision.HIGHEST).sum()

    timed("bwd H dot reshaped (HIGHEST)", bwd_dls_reshaped, G_s, DK_s)

    @jax.jit
    def bwd_dls_default(G, DK):
        H = G * DK
        return jnp.einsum(
            "bij,ijk->bk", H, D2, precision=jax.lax.Precision.DEFAULT
        ).sum()

    timed("bwd H*einsum(D2) (DEFAULT)", bwd_dls_default, G_s, DK_s)
    # Scan-amortized slope probes: the tunneled runtime has a ~24-25 ms
    # per-program-execution dispatch floor (every standalone piece above
    # reads 24-25 ms no matter its size/precision — the floor, not the op).
    # True in-program per-iteration cost = (T(k2) - T(k1)) / (k2 - k1) with
    # the iteration repeated inside ONE program via lax.scan, params
    # perturbed per step to defeat CSE.
    def _scan_vg(n_rep, value_only=False, precision=jax.lax.Precision.HIGHEST):
        def obj(p):
            def one(lls, ln, yy):
                par = KernelParams(log_length_scale=lls, log_noise=ln,
                                   log_constant=jnp.zeros((), jnp.float32))
                return log_marginal_likelihood_matmul(
                    cfg, par, D2, yy, 1e-8, precision=precision
                )
            return jnp.sum(jax.vmap(one)(p.log_length_scale, p.log_noise, y))

        f = obj if value_only else (lambda p: jax.value_and_grad(obj)(p)[1].log_noise.sum())

        @jax.jit
        def run(params):
            def step(carry, i):
                eps = 1e-4 * (i + 1).astype(jnp.float32)
                p = KernelParams(
                    log_length_scale=params.log_length_scale + eps,
                    log_noise=params.log_noise + eps,
                    log_constant=params.log_constant,
                )
                return carry + f(p), None

            out, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(n_rep))
            return out

        return run

    for tag, value_only in (("value+grad", False), ("value", True)):
        t2 = timed(f"scan x2 {tag}", _scan_vg(2, value_only), params)
        t8 = timed(f"scan x8 {tag}", _scan_vg(8, value_only), params)
        print(f"slope {tag}: {(t8 - t2) / 6 * 1000:.1f} ms/iter "
              f"(x2 {t2*1000:.0f} ms, x8 {t8*1000:.0f} ms)")
    for prec in ("HIGH", "DEFAULT"):
        p = getattr(jax.lax.Precision, prec)
        t2 = timed(f"scan x2 vg {prec}", _scan_vg(2, precision=p), params)
        t8 = timed(f"scan x8 vg {prec}", _scan_vg(8, precision=p), params)
        print(f"slope value+grad ({prec}): {(t8 - t2) / 6 * 1000:.1f} ms/iter")

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

# --- end-to-end fit_gps at the bench's production shape (BIQ_PROBE_FIT_E2E=1):
# isolates the true device cost of the whole fit phase (one jit) from the
# bench's surrounding plumbing (table prep, spec build, posterior download).
if _os.environ.get("BIQ_PROBE_FIT_E2E", ""):
    from bayesian_inference_tpu.models import gp_fit

    K_PC = int(_os.environ.get("BIQ_PROBE_K_PC", "41"))
    spec = gp_fit.spec_from_reference_config(
        cfg, param_min=np.zeros(d), param_max=np.ones(d),
        n_restarts=50, n_iters=60, alpha_jitter=1e-8, dtype=jnp.float32,
        lml_impl="matmul",
    )
    Xj = jnp.asarray(X)
    Y_pc = jnp.asarray(rng.normal(size=(N, K_PC)).astype(np.float32))
    key = jax.random.key(0)

    def run_fit():
        posts = gp_fit.fit_gps(spec, Xj, Y_pc, key)
        # bench-realistic: materialize the whole posterior on host
        return jax.tree.map(np.asarray, posts)

    t0 = time.perf_counter(); run_fit(); print(
        f"fit_gps first call (compile or cache load + exec): {time.perf_counter()-t0:.2f}s",
        file=sys.stderr)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); run_fit(); ts.append(time.perf_counter() - t0)
    print(f"fit_gps warm e2e (k={K_PC}, R=51, i60): median {np.median(ts):.3f}s "
          f"(reps {' '.join(f'{t:.3f}' for t in ts)})", file=sys.stderr)
    # device-only portion: skip the host download, one scalar out
    @jax.jit
    def fit_scalar(spec, Xj, Y_pc, key):
        posts = gp_fit._fit_gps_impl(spec, Xj, Y_pc, key)
        return jax.tree.map(lambda a: jnp.sum(a), posts)

    def run_scalarized():
        return jax.tree.map(np.asarray, fit_scalar(spec, Xj, Y_pc, key))
    run_scalarized()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); run_scalarized(); ts.append(time.perf_counter() - t0)
    print(f"fit_gps device-only (scalarized outputs): median {np.median(ts):.3f}s "
          f"(reps {' '.join(f'{t:.3f}' for t in ts)})", file=sys.stderr)
