"""Pallas block-MVN kernel: interpreter-mode parity vs scipy and the jnp path."""

import numpy as np
import jax.numpy as jnp

from bayesian_inference_tpu.ops.cholesky import tiny_cholesky, tiny_mvn_loglike, tiny_solve_lower
from bayesian_inference_tpu.ops.pallas_mvn import block_mvn_loglike

rng = np.random.default_rng(3)


def _random_blocks(W, B, nb):
    A = rng.normal(size=(W, B, nb, nb))
    C = A @ np.swapaxes(A, -1, -2) / nb + 2.0 * np.eye(nb)
    dY = rng.normal(size=(W, B, nb))
    return dY, C


def _scipy_ref(dY, C):
    from scipy.linalg import cholesky, solve_triangular

    W, B, nb = dY.shape
    out = np.zeros((W, B))
    for w in range(W):
        for b in range(B):
            L = cholesky(C[w, b], lower=True)
            e = solve_triangular(L, dY[w, b], lower=True)
            out[w, b] = -0.5 * e @ e - np.log(np.diag(L)).sum()
    return out


def test_tiny_cholesky_matches_numpy():
    _, C = _random_blocks(3, 4, 13)
    L = np.asarray(tiny_cholesky(jnp.asarray(C)))
    ref = np.linalg.cholesky(C)
    np.testing.assert_allclose(L, ref, rtol=1e-9, atol=1e-12)


def test_tiny_solve_lower():
    _, C = _random_blocks(2, 3, 9)
    L = np.linalg.cholesky(C)
    b = rng.normal(size=(2, 3, 9))
    y = np.asarray(tiny_solve_lower(jnp.asarray(L), jnp.asarray(b)))
    np.testing.assert_allclose(np.einsum("wbij,wbj->wbi", L, y), b, rtol=1e-9, atol=1e-10)


def test_tiny_mvn_loglike_matches_scipy():
    dY, C = _random_blocks(4, 5, 17)
    ours = np.asarray(tiny_mvn_loglike(jnp.asarray(dY), jnp.asarray(C)))
    np.testing.assert_allclose(ours, _scipy_ref(dY, C), rtol=1e-9)


def test_pallas_kernel_interpret_matches_scipy():
    """Run the actual Pallas kernel in interpreter mode (CPU) and check parity,
    including lane padding (batch not a multiple of 128)."""
    dY, C = _random_blocks(5, 7, 21)  # batch 35 -> pads to 128
    ours = np.asarray(block_mvn_loglike(jnp.asarray(dY), jnp.asarray(C), interpret=True))
    np.testing.assert_allclose(ours, _scipy_ref(dY, C), rtol=1e-8)


def test_block_mvn_dispatch_cpu_path():
    dY, C = _random_blocks(2, 3, 8)
    auto = np.asarray(block_mvn_loglike(jnp.asarray(dY), jnp.asarray(C)))
    np.testing.assert_allclose(auto, _scipy_ref(dY, C), rtol=1e-9)


def _random_fused(W, B, nb, k, seed=5):
    r = np.random.default_rng(seed)
    U = r.normal(size=(B, nb, k)) / np.sqrt(k)
    A = r.normal(size=(B, nb, nb))
    D = A @ np.swapaxes(A, -1, -2) / nb + 2.0 * np.eye(nb)
    d0 = r.normal(size=(B, nb))
    z = r.normal(size=(W, k))
    v = r.uniform(0.1, 1.0, size=(W, k))
    return U, D, d0, z, v


def _fused_ref(U, D, d0, z, v):
    dY = d0 + np.einsum("bfk,wk->wbf", U, z)
    C = D + np.einsum("bfk,wk,bgk->wbfg", U, v, U)
    return _scipy_ref(dY, C).sum(axis=1)


def test_fused_block_mvn_interpret_matches_scipy():
    """Full fused kernel (assembly + Cholesky + loglike) in interpreter mode,
    including walker-lane padding and the d0-as-extra-U-column folding."""
    from bayesian_inference_tpu.ops.pallas_mvn import fused_block_mvn_loglike

    U, D, d0, z, v = _random_fused(W=37, B=4, nb=11, k=9)  # 37 walkers -> pads to 128
    ours = np.asarray(
        fused_block_mvn_loglike(
            *(jnp.asarray(a) for a in (U, D, d0, z, v)),
            interpret=True, dot_mode="highest",
        )
    )
    np.testing.assert_allclose(ours, _fused_ref(U, D, d0, z, v), rtol=1e-8)


def test_fused_block_mvn_vmap_over_d0():
    """The closure-test batch vmaps the likelihood over per-point residual
    offsets; the pallas batching rule must handle a mapped d0 with broadcast
    U/D (interpret mode exercises the same rule the TPU path uses)."""
    import jax

    from bayesian_inference_tpu.ops.pallas_mvn import fused_block_mvn_loglike

    U, D, d0, z, v = _random_fused(W=5, B=3, nb=9, k=7)
    P = 4
    d0_batch = np.stack([d0 * (1 + 0.1 * p) for p in range(P)])
    out = jax.vmap(
        lambda d: fused_block_mvn_loglike(
            jnp.asarray(U), jnp.asarray(D), d, jnp.asarray(z), jnp.asarray(v),
            interpret=True, dot_mode="highest",
        )
    )(jnp.asarray(d0_batch))
    ref = np.stack([_fused_ref(U, D, d0_batch[p], z, v) for p in range(P)])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-8)


def test_fused_packed_mvn_interpret_matches_scipy():
    """Lane-packed fused kernel (m observable blocks per program): parity in
    interpreter mode at the production half-ensemble width (W=50 -> wt=64,
    m=2) including an odd block count (observable padding)."""
    from bayesian_inference_tpu.ops.pallas_mvn import fused_block_mvn_loglike

    U, D, d0, z, v = _random_fused(W=50, B=5, nb=11, k=9)  # B=5 pads to 6 groups of 2
    ours = np.asarray(
        fused_block_mvn_loglike(
            *(jnp.asarray(a) for a in (U, D, d0, z, v)),
            interpret=True, dot_mode="highest",
        )
    )
    np.testing.assert_allclose(ours, _fused_ref(U, D, d0, z, v), rtol=1e-8)


def test_fused_packed_mvn_high_packing_factor():
    """Small walker batches pack at m=8 (wt=16); exact segment-boundary width
    (W=16 -> no walker padding) and W=13 (padding inside each segment)."""
    from bayesian_inference_tpu.ops.pallas_mvn import fused_block_mvn_loglike

    for W in (16, 13):
        U, D, d0, z, v = _random_fused(W=W, B=9, nb=7, k=6, seed=11 + W)
        ours = np.asarray(
            fused_block_mvn_loglike(
                *(jnp.asarray(a) for a in (U, D, d0, z, v)),
                interpret=True, dot_mode="highest",
            )
        )
        np.testing.assert_allclose(ours, _fused_ref(U, D, d0, z, v), rtol=1e-8)


def test_fused_block_mvn_dispatch_cpu_path():
    from bayesian_inference_tpu.ops.pallas_mvn import fused_block_mvn_loglike

    U, D, d0, z, v = _random_fused(W=6, B=3, nb=7, k=5)
    auto = np.asarray(
        fused_block_mvn_loglike(*(jnp.asarray(a) for a in (U, D, d0, z, v)))
    )
    np.testing.assert_allclose(auto, _fused_ref(U, D, d0, z, v), rtol=1e-9)


def test_fused_mvn_bf16x3_dot_mode_tolerance():
    """The DEFAULT in-kernel dot mode is bf16x3 (the framework-wide HIGH
    matmul standard, adopted 2026-08-19 — the 6-pass HIGHEST dots were 43 of
    the 88 us/step production kernel cost). This pins its accuracy contract:
    within 5e-6 relative of the f64 oracle on both the packed (W=50) and
    plain (W=37 -> lane-padded) kernels, and well separated from the strict
    1e-8 'highest' parity asserted above."""
    from bayesian_inference_tpu.ops.pallas_mvn import fused_block_mvn_loglike

    for W in (50, 37):
        U, D, d0, z, v = _random_fused(W=W, B=5, nb=11, k=9, seed=23 + W)
        ours = np.asarray(
            fused_block_mvn_loglike(
                *(jnp.asarray(a) for a in (U, D, d0, z, v)),
                interpret=True, dot_mode="bf16x3",
            )
        )
        np.testing.assert_allclose(ours, _fused_ref(U, D, d0, z, v), rtol=5e-6)
