"""Pallas TPU kernel: fused batched tiny-MVN log-likelihood.

THE hot op of the MCMC loop: for every (walker, observable-block) pair,
factorize the small covariance block and evaluate the Gaussian log-likelihood

    ll = -1/2 ||L^{-1} dY||^2 - sum(log diag L),   C = L L^T.

XLA's generic Cholesky/TriangularSolve at these shapes (e.g. 800 matrices of
21x21) costs ~2 ms per call and minutes of compile time; this kernel runs the
whole thing in VMEM with the batch on the lane dimension, fusing the column
factorization, the forward substitution, and the log-determinant into one
pass — no L is ever materialized:

  per column j:  inv_p = rsqrt(A[j,j])          (vector over batch lanes)
                 col   = A[:,j] * inv_p          masked below-diagonal
                 y_j   = b[j] * inv_p ; b -= col * y_j
                 quad += y_j^2 ; half_logdet += log(A[j,j])/2
                 A    -= col col^T                (rank-1 Schur downdate)

Layout: (nb, nb, batch) with batch padded to a lane multiple; padded lanes get
an identity covariance and a zero RHS, contributing exactly 0.

On non-TPU backends the portable unrolled jnp implementation
(ops/cholesky.tiny_mvn_loglike) is used instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mvn_kernel(nb: int, a_ref, b_ref, out_ref):
    A = a_ref[:]          # (nb, nb, batch)
    b = b_ref[:]          # (nb, batch)
    batch = A.shape[-1]
    quad = jnp.zeros((1, batch), A.dtype)
    half_logdet = jnp.zeros((1, batch), A.dtype)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (nb, batch), 0)

    for j in range(nb):
        pivot = A[j, :, :][j : j + 1, :]                      # (1, batch) = A[j, j, :]
        inv_p = jax.lax.rsqrt(pivot)
        col = A[:, j, :] * inv_p                              # (nb, batch)
        col = jnp.where(row_ids >= j, col, jnp.zeros_like(col))
        y_j = b[j : j + 1, :] * inv_p                         # (1, batch)
        b = b - col * y_j
        quad = quad + y_j * y_j
        half_logdet = half_logdet + 0.5 * jnp.log(pivot)
        A = A - col[:, None, :] * col[None, :, :]

    out_ref[:] = -0.5 * quad - half_logdet


@functools.partial(jax.jit, static_argnames=("interpret",))
def _block_mvn_pallas(Ct: jax.Array, dYt: jax.Array, interpret: bool = False) -> jax.Array:
    """(nb, nb, batch), (nb, batch) -> (1, batch) loglikes."""
    nb, _, batch = Ct.shape
    kernel = functools.partial(_mvn_kernel, nb)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, batch), Ct.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Ct, dYt)


def block_mvn_loglike(dY: jax.Array, C: jax.Array, interpret: bool | None = None) -> jax.Array:
    """Fused MVN loglike for (..., nb) residuals and (..., nb, nb) covariances.

    Flattens the leading batch dims onto the TPU lane dimension (padded lanes
    are identity/zero and contribute 0), runs the fused kernel, and restores
    the batch shape. ``interpret=None`` auto-selects interpreter mode off-TPU.
    """
    *lead, nb = dY.shape
    if interpret is None:
        if nb > 48:
            # Very wide observable blocks: the single-program kernel's
            # (nb, nb, batch) working set would outgrow VMEM.
            from bayesian_inference_tpu.ops.mvn import mvn_loglike_dense

            return mvn_loglike_dense(dY, C)
        from bayesian_inference_tpu.ops.cholesky import tiny_mvn_loglike

        # Select by LOWERING platform, not jax.default_backend(): the same
        # traced function must lower on a cpu-backend jit even when the
        # process default is TPU (e.g. scripts/parity_check.py --device runs
        # the reference sampler's likelihood on the host).
        return jax.lax.platform_dependent(
            dY, C,
            tpu=lambda d, c: block_mvn_loglike(d, c, interpret=False),
            default=tiny_mvn_loglike,
        )
    batch = 1
    for s in lead:
        batch *= s
    pad = (-batch) % 128

    Cf = C.reshape(batch, nb, nb)
    bf = dY.reshape(batch, nb)
    if pad:
        eye = jnp.broadcast_to(jnp.eye(nb, dtype=C.dtype), (pad, nb, nb))
        Cf = jnp.concatenate([Cf, eye], axis=0)
        bf = jnp.concatenate([bf, jnp.zeros((pad, nb), dY.dtype)], axis=0)

    ll = _block_mvn_pallas(Cf.transpose(1, 2, 0), bf.T, interpret=interpret)
    return ll[0, :batch].reshape(*lead)
