"""AOT TPU lowering check for the hot device programs (no TPU needed).

Runs the full Pallas->Mosaic MLIR generation for TPU on any host via jax's
multi-platform lowering: unsupported-primitive and layout errors in kernels
surface here instead of on the tunneled device (where a failed compile costs
minutes and a crashed worker costs hours). Exercised by
tests/test_tpu_lowering.py in a subprocess (the checks need the production
float32/x64-off configuration); also usable directly:

    python scripts/check_tpu_lowering.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "src"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

f32 = np.float32
rng = np.random.default_rng(0)


def lower_tpu(traced) -> str:
    return traced.lower(lowering_platforms=("tpu",)).as_text()


def check_fit_program() -> None:
    from bayesian_inference_tpu.models.gp_fit import _fit_gps_impl, spec_from_reference_config
    from bayesian_inference_tpu.ops.gram import KernelConfig

    N, d, k = 200, 6, 3  # N=200 exercises the 4-panel blocked path incl. padding
    spec = spec_from_reference_config(
        KernelConfig(nu=1.5, with_noise=True),
        param_min=np.zeros(d), param_max=np.ones(d),
        n_restarts=2, n_iters=4, alpha_jitter=1e-6,
        dtype=jnp.float32, lml_impl="matmul",
    )
    X = jnp.asarray(rng.uniform(size=(N, d)).astype(f32))
    Y = jnp.asarray(rng.normal(size=(N, k)).astype(f32))
    txt = lower_tpu(
        jax.jit(lambda s, x, y, key: _fit_gps_impl(s, x, y, key)).trace(
            spec, X, Y, jax.random.key(0)
        )
    )
    n_calls = txt.count("tpu_custom_call")
    assert n_calls >= 1, "expected the pallas diagonal kernel in the fit program"
    print(f"fit program (matmul LML): TPU lowering OK ({n_calls} pallas calls)")


def _make_likelihood():
    from bayesian_inference_tpu.mcmc.likelihood import EmulatorLikelihood, GroupGPs
    from bayesian_inference_tpu.models.gp import GPPosterior
    from bayesian_inference_tpu.ops.gram import KernelConfig, KernelParams

    k, N, d = 5, 40, 6
    posts = GPPosterior(
        params=KernelParams(
            log_length_scale=jnp.asarray(rng.normal(size=(k, d)).astype(f32)),
            log_noise=jnp.asarray(rng.normal(size=(k,)).astype(f32)),
            log_constant=jnp.zeros((k,), jnp.float32),
        ),
        X=jnp.asarray(np.broadcast_to(rng.uniform(size=(N, d)).astype(f32), (k, N, d))),
        alpha=jnp.asarray(rng.normal(size=(k, N)).astype(f32)),
        Kinv=jnp.asarray(np.broadcast_to(np.eye(N, dtype=f32), (k, N, N))),
        prior_var=jnp.ones((k,), jnp.float32),
        lml=jnp.zeros((k,), jnp.float32),
    )
    U, D, d0 = [], [], []
    for nb, cnt in ((8, 3), (16, 4)):
        U.append(jnp.asarray(rng.normal(size=(cnt, nb, k)).astype(f32) * 0.1))
        D.append(jnp.asarray(np.broadcast_to(np.eye(nb, dtype=f32), (cnt, nb, nb))))
        d0.append(jnp.asarray(rng.normal(size=(cnt, nb)).astype(f32)))
    return EmulatorLikelihood(
        groups=(GroupGPs(cfg=KernelConfig(nu=1.5, with_noise=True), posts=posts),),
        theta_min=jnp.zeros((d,), jnp.float32),
        theta_max=jnp.ones((d,), jnp.float32),
        U=tuple(U), D=tuple(D), d0=tuple(d0), wb=None, mode="block",
    )


def check_sampler_program() -> None:
    from bayesian_inference_tpu.mcmc.stretch import init_state, run_chunk

    like = _make_likelihood()
    W, d = 100, 6  # W=100 -> 50-walker halves: lane-packed kernel
    x0 = jnp.asarray(rng.uniform(0.2, 0.8, size=(W, d)).astype(f32))

    def fn(aux, x):
        return aux.log_posterior(x)

    state = init_state.__wrapped__(jax.random.key(0), fn, x0, aux=like)
    txt = lower_tpu(
        jax.jit(lambda st, aux: run_chunk(st, fn, 10, aux=aux)[1][2]).trace(state, like)
    )
    n_calls = txt.count("tpu_custom_call")
    assert n_calls >= len(like.U), "expected one packed MVN kernel per bucket"
    print(f"sampler scan (packed MVN, shared-sqdiff GP eval): TPU lowering OK ({n_calls} pallas calls)")


def check_sampler_program_lowrank() -> None:
    """Lowrank mode routes the Woodbury capacitance solve through the Pallas
    block-MVN kernel (ops/mvn.py::woodbury_loglike); its sampler program is
    AOT-compiled like block mode's, so its TPU lowering needs the same guard."""
    from bayesian_inference_tpu.mcmc.stretch import init_state, run_chunk
    from bayesian_inference_tpu.ops.mvn import build_woodbury

    like = _make_likelihood()
    F = sum(int(np.prod(u.shape[:2])) for u in like.U)
    wb = build_woodbury(
        jnp.asarray(np.eye(F, dtype=f32)),
        jnp.asarray(rng.normal(size=(F, 5)).astype(f32) * 0.1),
        jnp.asarray(rng.normal(size=(F,)).astype(f32)),
    )
    like = like.replace(wb=wb, mode="lowrank")
    W, d = 100, 6
    x0 = jnp.asarray(rng.uniform(0.2, 0.8, size=(W, d)).astype(f32))

    def fn(aux, x):
        return aux.log_posterior(x)

    state = init_state.__wrapped__(jax.random.key(0), fn, x0, aux=like)
    txt = lower_tpu(
        jax.jit(lambda st, aux: run_chunk(st, fn, 10, aux=aux)[1][2]).trace(state, like)
    )
    n_calls = txt.count("tpu_custom_call")
    assert n_calls >= 1, "expected the Woodbury capacitance Pallas kernel"
    print(f"lowrank sampler scan (Woodbury via packed MVN): TPU lowering OK ({n_calls} pallas calls)")


def check_closure_batch_program() -> None:
    """The closure batch vmaps the sampler over P validation points, so the
    packed MVN kernel lowers through the pallas BATCHING rule (an extra grid
    dimension over the mapped d0/z/v operands)."""
    from bayesian_inference_tpu.mcmc.stretch import init_state_batched, run_chunk_batched

    like = _make_likelihood()
    P, W, d = 3, 100, 6
    d0_batch = tuple(
        jnp.asarray(rng.normal(size=(P,) + tuple(x.shape)).astype(f32)) for x in like.d0
    )
    x0 = jnp.asarray(rng.uniform(0.2, 0.8, size=(P, W, d)).astype(f32))
    keys = jax.random.split(jax.random.key(0), P)

    def fn(shared, d0_p, x):
        return shared.log_posterior_with_d0(d0_p, x)

    states = init_state_batched.__wrapped__(keys, fn, x0, d0_batch, shared_aux=like)
    txt = lower_tpu(
        jax.jit(
            lambda st, aux, shared: run_chunk_batched(
                st, fn, aux, 5, shared_aux=shared
            )[1][0]
        ).trace(states, d0_batch, like)
    )
    n_calls = txt.count("tpu_custom_call")
    assert n_calls >= len(like.U)
    print(f"closure batch (P-vmapped packed MVN): TPU lowering OK ({n_calls} pallas calls)")


if __name__ == "__main__":
    check_fit_program()
    check_sampler_program()
    check_sampler_program_lowrank()
    check_closure_batch_program()
    print("ALL TPU LOWERINGS OK")
