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
