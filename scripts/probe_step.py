"""One-off probe: decompose per-step sampler cost on the TPU.

Times 5000-step scans of the stretch move with these likelihood variants:
full (gp_eval + fused kernel), kernel-only (constant z,v), gp_eval-only,
gp_eval via the legacy per-PC vmap (predict_all), and a no-likelihood
baseline (scan bookkeeping only). Set BIQ_MVN_PACK=0 before launch to A/B
the lane-packed fused kernel against the plain one.

Usage: run bench.py first (leaves fitted artifacts in output/bench_*), then
  python scripts/probe_step.py [fixture|production]
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
import logging; logging.basicConfig(level=logging.WARNING)
import numpy as np, yaml
import jax.numpy as jnp

from bayesian_inference_tpu.io import observables as obs_io
from bayesian_inference_tpu.mcmc.likelihood import build_likelihood
from bayesian_inference_tpu.mcmc.stretch import init_state, run_chunk
from bayesian_inference_tpu.ops.pallas_mvn import fused_block_mvn_loglike
from bayesian_inference_tpu.pipeline.configs import EmulationConfig

profile = sys.argv[1] if len(sys.argv) > 1 else "fixture"
workdir = REPO / "output" / f"bench_{profile}"
if not workdir.exists():
    workdir = REPO / "output" / "bench_run"  # legacy layout
cfg = yaml.safe_load((workdir / "bench.yaml").read_text())
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
like = build_likelihood(emu_config, results, exp,
                        theta_min=np.asarray(spec["min"], float),
                        theta_max=np.asarray(spec["max"], float), mode="block")
dt = like.theta_min.dtype
W = 100
key = jax.random.key(0)
x0 = jax.random.uniform(key, (W, 6), minval=like.theta_min, maxval=like.theta_max, dtype=dt)

z_const, v_const = like.gp_eval(x0)  # (W, 41) fixed operands for kernel-only


def lp_full(x):
    return like.log_posterior(x)


def lp_kernel_only(x):
    # same kernel work, but z/v taken from x's first column mixed with consts
    # (keeps a data dependence on x so the scan can't hoist the kernel call)
    z = z_const[: x.shape[0]] + x[:, :1] * 0.0
    v = v_const[: x.shape[0]]
    ll = None
    for U_b, D_b, d0_b in zip(like.U, like.D, like.d0):
        term = fused_block_mvn_loglike(U_b, D_b, d0_b, z, v)
        ll = term if ll is None else ll + term
    return ll


def lp_gp_only(x):
    z, v = like.gp_eval(x)
    return jnp.sum(z, axis=-1) - jnp.sum(v, axis=-1)


def lp_gp_only_vmap(x):
    # legacy per-PC vmapped predict (pre shared-sqdiff) for A/B
    from bayesian_inference_tpu.models import gp as gp_mod

    zs, vs = [], []
    for g in like.groups:
        z, v = gp_mod.predict_all(g.cfg, g.posts, x)
        zs.append(z)
        vs.append(v)
    z = jnp.concatenate(zs, axis=1)
    v = jnp.concatenate(vs, axis=1)
    return jnp.sum(z, axis=-1) - jnp.sum(v, axis=-1)


def lp_none(x):
    # scan/bookkeeping floor: a data-dependent but near-free "likelihood"
    return -jnp.sum(x * x, axis=-1)


N = 5000
# (tag, log_prob_fn, run_chunk kwargs) — the extra floor variants decompose
# the scan bookkeeping: no-split removes the per-step random permutation +
# argsort pair; store-off removes the per-step chain stacking.
variants = [
    ("full", lp_full, {}),
    ("kernel-only", lp_kernel_only, {}),
    ("gp-only", lp_gp_only, {}),
    ("gp-only-vmap", lp_gp_only_vmap, {}),
    ("no-likelihood", lp_none, {}),
    ("no-likelihood/no-split", lp_none, {"randomize_split": False}),
    ("no-likelihood/store-off", lp_none, {"store_chain": False}),
]

import os as _os

if _os.environ.get("BIQ_PROBE_GP", ""):
    # Cumulative gp_eval decomposition (VERDICT r4 next #4): the ~30 us/step
    # GP-eval share never got the probe treatment the MVN kernel did. Stages
    # of gp.predict_all_shared, each variant adding the next compute block:
    #   gp-sqdiff : (B,N,d) walker-design differences + per-PC ls contraction
    #   gp-matern : + Matern kernel vector ks (the exp/VPU transcendental)
    #   gp-mean   : + mean einsum kbn,kn->bk  (alpha contraction)
    #   gp-var == gp-only (full predict: + Kinv contraction + var reduction)
    # Opt-in (BIQ_PROBE_GP=1): each novel variant is a fresh remote compile.
    from bayesian_inference_tpu.ops.gram import matern_from_sqdist

    _posts = like.groups[0].posts
    _cfg_g = like.groups[0].cfg
    _XX = _posts.X[0]
    _hi = jax.lax.Precision.HIGHEST

    def _sq(x):
        diff = x[:, None, :] - _XX[None, :, :]
        D2 = diff * diff
        w = jnp.exp(-2.0 * _posts.params.log_length_scale)
        return jnp.einsum("bnd,kd->kbn", D2, w, precision=_hi)

    def _ks(x):
        ks = matern_from_sqdist(_sq(x), _cfg_g.nu)
        if _cfg_g.with_constant:
            ks = ks + jnp.exp(_posts.params.log_constant)[:, None, None]
        return ks

    def lp_gp_sqdiff(x):
        return jnp.sum(_sq(x), axis=(0, 2)) * -1e-6

    def lp_gp_matern(x):
        return jnp.sum(_ks(x), axis=(0, 2)) * -1e-6

    def lp_gp_mean(x):
        ks = _ks(x)
        mean = jnp.einsum("kbn,kn->bk", ks, _posts.alpha)
        return jnp.sum(mean, axis=-1) - jnp.sum(ks, axis=(0, 2)) * 1e-6

    variants[3:3] = [
        ("gp-sqdiff", lp_gp_sqdiff, {}),
        ("gp-matern", lp_gp_matern, {}),
        ("gp-mean", lp_gp_mean, {}),
    ]

# BIQ_PROBE_ONLY=full,kernel-only runs a subset: each novel variant costs a
# fresh 60-500 s remote compile, so A/Bs (dot precision, packing) should only
# pay for the variants they compare.
_only = [t for t in _os.environ.get("BIQ_PROBE_ONLY", "").split(",") if t]
if _only:
    variants = [v for v in variants if v[0] in _only]

if _os.environ.get("BIQ_PROBE_LOWRANK", ""):
    # Woodbury full-covariance mode (VERDICT r3 weak #5): its vmapped (k,k)
    # cholesky+solve inside the scan is the op class XLA:TPU lowers
    # pathologically — measure it instead of guessing. Opt-in: one extra
    # 60-500 s remote compile.
    like_lr = build_likelihood(
        emu_config, results, exp,
        theta_min=np.asarray(spec["min"], float),
        theta_max=np.asarray(spec["max"], float), mode="lowrank",
    )

    def lp_lowrank(x):
        return like_lr.log_posterior(x)

    if not _only or "full-lowrank" in _only:
        variants.insert(1, ("full-lowrank", lp_lowrank, {}))

for tag, fn, kw in variants:
    st = init_state(key, fn, x0)
    st, ys = run_chunk(st, fn, N, **kw)
    trace = ys[2] if kw.get("store_chain", True) else ys
    np.asarray(trace)  # materialize (first call: compile+exec)
    t0 = time.perf_counter()
    st, ys = run_chunk(st, fn, N, **kw)
    trace = ys[2] if kw.get("store_chain", True) else ys
    np.asarray(trace)
    dtw = time.perf_counter() - t0
    print(f"{tag}: {N} steps in {dtw:.2f}s ({dtw/N*1e6:.0f} us/step)", file=sys.stderr)
