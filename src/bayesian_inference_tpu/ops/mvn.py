"""Batched multivariate-normal log-likelihood: dense and Woodbury low-rank.

The dense path replaces the reference's per-sample LAPACK dpotrf/dpotrs loop
(log_posterior.py:104-146) with one batched on-chip Cholesky.

The Woodbury path exploits the structure the reference leaves on the table
(noted at emulation.py:521): the MCMC covariance is

    C(theta) = D + U diag(v(theta)) U^T

where D = Sigma_unexplained + diag(sigma_data^2) is a *constant* dense matrix
and U = (components^T * scale) has only k = n_pc columns. A one-time Cholesky
of D reduces every per-walker likelihood from O(n_features^3) to O(n_pc^3) --
~100x fewer flops at production shapes (n_features ~ 200, n_pc ~ 5-41) with
bit-comparable results (it is an exact identity, not an approximation).

Matching the reference likelihood normalization: logp = -1/2 y^T C^-1 y
- 1/2 log det C (the -n/2 log 2pi constant is dropped; it cancels in MCMC).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


def mvn_loglike_dense(dY: jax.Array, cov: jax.Array) -> jax.Array:
    """Unnormalized MVN loglike for batched (B, F) residuals and (B, F, F) covariances.

    quad = ||L^-1 dY||^2 needs only the forward triangular solve (half the
    solve cost of the cho_solve formulation). Small trailing dimensions route
    to the unrolled batch-vectorized factorization (ops/cholesky.py), which is
    ~15x faster than XLA's generic Cholesky at the MCMC block sizes.
    """
    n = cov.shape[-1]
    if n <= 32:
        from bayesian_inference_tpu.ops.cholesky import tiny_mvn_loglike

        return tiny_mvn_loglike(dY, cov)
    L = jnp.linalg.cholesky(cov)
    e = jax.scipy.linalg.solve_triangular(L, dY[..., None], lower=True)[..., 0]
    quad = jnp.sum(e * e, axis=-1)
    half_logdet = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return -0.5 * quad - half_logdet


@struct.dataclass
class WoodburyNormal:
    """Precomputed pieces of the low-rank-plus-constant Gaussian likelihood.

    With e0 = L_D^{-1} d0 (d0 = constant part of the residual) and
    W = L_D^{-1} U:

      quad(z, v) = c0 + 2 b.z + z.G.z - (b + G z)^T (diag(1/v) + G)^{-1} (b + G z)
      logdet(v)  = 2*half_logdet_D + sum(log v) + logdet(diag(1/v) + G)

    Only (b, c0, d0) depend on the data vector; (L_D, W, G, half_logdet_D) are
    d0-independent, so ``with_d0`` rebuilds the likelihood for a new data
    vector (closure pseudodata) without re-factorizing D — the identity the
    batched closure runner vmaps over.
    """

    b: jax.Array             # (k,)    W^T e0
    G: jax.Array             # (k, k)  W^T W = U^T D^-1 U
    c0: jax.Array            # ()      e0^T e0
    half_logdet_D: jax.Array # ()
    U: jax.Array             # (F, k)  kept for mean reconstruction / diagnostics
    d0: jax.Array            # (F,)    constant residual offset (m0 - y_data)
    L_D: jax.Array           # (F, F)  Cholesky factor of the constant covariance
    W: jax.Array             # (F, k)  L_D^{-1} U

    def with_d0(self, d0: jax.Array) -> "WoodburyNormal":
        """Rebuild the d0-dependent pieces (b, c0) from the cached factor —
        identical formulas to build_woodbury, so a batched closure evaluation
        is bit-exact with a sequential per-point rebuild."""
        e0 = jax.scipy.linalg.solve_triangular(self.L_D, d0, lower=True)
        return self.replace(b=self.W.T @ e0, c0=e0 @ e0, d0=d0)


@jax.jit
def build_woodbury(D: jax.Array, U: jax.Array, d0: jax.Array) -> WoodburyNormal:
    """One-time O(F^3) setup; everything per-walker afterwards is O(k^3).

    jitted as ONE program: eagerly this is ~7 device dispatches, and on the
    tunneled remote-compile backend every eager op costs a round-trip (plus a
    tiny compile the first time) — see CLAUDE.md environment hazards. The
    operands are runtime inputs, so the persistent-cache key is
    value-independent like the sampler programs'."""
    L_D = jnp.linalg.cholesky(D)
    e0 = jax.scipy.linalg.solve_triangular(L_D, d0, lower=True)
    W = jax.scipy.linalg.solve_triangular(L_D, U, lower=True)
    return WoodburyNormal(
        b=W.T @ e0,
        G=W.T @ W,
        c0=e0 @ e0,
        half_logdet_D=jnp.sum(jnp.log(jnp.diagonal(L_D))),
        U=U,
        d0=d0,
        L_D=L_D,
        W=W,
    )


def woodbury_loglike(wn: WoodburyNormal, z: jax.Array, v: jax.Array) -> jax.Array:
    """Batched loglike; z, v of shape (..., k): PC-space means and variances.

    The capacitance solve + logdet — the only O(k^3) term — is expressed as a
    tiny-MVN loglike of (r, M) and routed through ops.pallas_mvn.
    block_mvn_loglike: on TPU that is the fused lane-batched Pallas kernel, on
    CPU the unrolled f64 factorization. The previous formulation ran a vmapped
    jnp.linalg.cholesky + solve_triangular at (k, k) inside the sampler scan,
    exactly the op class XLA:TPU lowers pathologically (ops/cholesky.py:3-8);
    see NOTES.md round-4 log for the measured before/after A/B at production
    width."""
    import os as _os

    from bayesian_inference_tpu.ops.pallas_mvn import block_mvn_loglike

    k = wn.G.shape[0]
    M = wn.G + jnp.einsum("...k,kj->...kj", 1.0 / v, jnp.eye(k, dtype=v.dtype))
    r = wn.b + jnp.einsum("ij,...j->...i", wn.G, z)
    if _os.environ.get("BIQ_WOODBURY", "") == "xla":
        # Pre-2026-08-19 formulation, kept for on-device A/B (trace-time knob).
        L_M = jnp.linalg.cholesky(M)
        t = jax.scipy.linalg.solve_triangular(L_M, r[..., None], lower=True)[..., 0]
        quad = (
            wn.c0
            + 2.0 * jnp.einsum("k,...k->...", wn.b, z)
            + jnp.einsum("...i,ij,...j->...", z, wn.G, z)
            - jnp.sum(t * t, axis=-1)
        )
        logdet = (
            2.0 * wn.half_logdet_D
            + jnp.sum(jnp.log(v), axis=-1)
            + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L_M, axis1=-2, axis2=-1)), axis=-1)
        )
        return -0.5 * (quad + logdet)
    # The Woodbury identity needs +1/2 r^T M^-1 r - 1/2 logdet M (the solve
    # term REDUCES the quadratic), while an MVN loglike of (r, M) is
    # -1/2 r^T M^-1 r - 1/2 logdet M. Two kernel calls recover it exactly:
    #   2 * loglike(0, M) - loglike(r, M) = +1/2 r^T M^-1 r - 1/2 logdet M.
    # Each call is one fused factorization sweep; at sampler shapes (k ~ 41,
    # walkers on the lane axis) both together are far below the block-mode
    # kernel's per-step cost.
    tiny_r = block_mvn_loglike(r, M)
    tiny_0 = block_mvn_loglike(jnp.zeros_like(r), M)
    rest = (
        wn.c0
        + 2.0 * jnp.einsum("k,...k->...", wn.b, z)
        + jnp.einsum("...i,ij,...j->...", z, wn.G, z)
        + 2.0 * wn.half_logdet_D
        + jnp.sum(jnp.log(v), axis=-1)
    )
    return (2.0 * tiny_0 - tiny_r) - 0.5 * rest
