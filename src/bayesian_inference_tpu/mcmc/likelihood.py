"""On-device log-posterior for the emulated Gaussian likelihood.

Replaces the reference's per-walker host loop (log_posterior.py:42-146:
emulator predict -> dense covariance assembly -> LAPACK dpotrf/dpotrs) with a
single jitted function evaluating ALL walkers at once on-chip.

Two likelihood structures:

* ``block`` (default — bit-parity with the reference pipeline): the merged
  emulator covariance is block-diagonal per observable (see models/emulator.py
  merge notes), so the likelihood decomposes into a sum of small independent
  MVN terms. Observable blocks are grouped into SIZE BUCKETS (padded width a
  multiple of 8) and each bucket runs one batched Cholesky over
  (n_walkers, n_obs_bucket, nb, nb). At production shapes this is ~50x fewer
  flops than the reference's dense n_features^3 factorize, and the bucketing
  keeps the per-block Cholesky cost at sum_b count_b*nb_b^3 instead of
  n_obs*max_nb^3 (bin counts span ~4-25, so global padding would waste ~10x).

* ``lowrank`` (opt-in improvement): keeps the full PCA-induced cross-observable
  covariance C(theta) = D + U diag(v(theta)) U^T via the exact Woodbury
  identity (ops/mvn.py) — O(n_pc^3) per walker. This is the physically more
  complete model the reference approximates away at group merge.

Uniform box prior: walkers outside [min, max] get -inf (where-masked; the
likelihood itself is evaluated at box-clipped positions so the Cholesky always
sees valid covariances).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from bayesian_inference_tpu.models import emulator as emulator_mod
from bayesian_inference_tpu.models import gp as gp_mod
from bayesian_inference_tpu.ops.gram import KernelConfig
from bayesian_inference_tpu.ops.mvn import WoodburyNormal, build_woodbury, woodbury_loglike


@struct.dataclass
class GroupGPs:
    cfg: KernelConfig
    posts: gp_mod.GPPosterior  # stacked over the group's PCs


# Cost of one extra fused-kernel launch per likelihood eval, in the same
# count*nb^2 units as the per-block Cholesky work. Calibrated on TPU v5e
# (scripts/probe_buckets.py, 2026-08-17, 5000-step production scans):
#   fixture    (padded {8:6,16:6,24:4}):  3 buckets 165 us/step, 1 bucket 174
#   production (padded {8:40,16:96,24:8}): 3 buckets 283, 2 buckets 294, 1: 387
# i.e. a launch inside the scan body costs only ~2-4 us while padded work runs
# ~1.5-2 ns per unit — fine bucketing wins at realistic spreads, and the
# constant (~a launch's worth of work) exists to merge only near-free cases
# and to keep one outlier width from adding a launch for a single block.
_LAUNCH_COST = 2048.0


def bucket_layout(
    widths: Sequence[int], launch_cost: float = _LAUNCH_COST
) -> list[tuple[int, list[int]]]:
    """Partition observable blocks into padded-width buckets (multiples of 8).

    Each bucket runs as ONE batched fused-Cholesky kernel launch, with every
    block padded to the bucket width. Two costs trade off: padding waste
    (count * nb_pad^2 per-lane work vs the block's own width) and per-launch
    overhead. A tiny DP over the sorted distinct padded widths picks the
    partition minimizing  sum_groups [launch_cost + (count in group) *
    (group max nb)^2]  — one global bucket when the width spread is mild
    (both bundled profiles: spread 8-24, waste < 3x, launches dominate), a
    split only when outlier widths would inflate the padded work past the
    cost of another launch. Returns [(nb_pad, [observable indices])] in
    ascending nb_pad — a pure function of the bin widths, so every tensor
    builder (build_likelihood, pad_residual_offsets, __graft_entry__) derives
    the identical layout.
    """
    import os as _os

    launch_cost = float(_os.environ.get("BIQ_BUCKET_LAUNCH_COST", launch_cost))
    pads: dict[int, list[int]] = {}
    for i, w in enumerate(widths):
        nb = max(8, ((int(w) + 7) // 8) * 8)
        pads.setdefault(nb, []).append(i)
    nbs = sorted(pads)
    counts = [len(pads[nb]) for nb in nbs]
    n = len(nbs)

    # best[j] = (cost, first-index-of-last-group) over widths nbs[:j]
    best: list[tuple[float, int]] = [(0.0, 0)] + [(float("inf"), 0)] * n
    for j in range(1, n + 1):
        for i in range(j):  # last group = nbs[i:j], padded to nbs[j-1]
            cost = best[i][0] + launch_cost + sum(counts[i:j]) * nbs[j - 1] ** 2
            if cost < best[j][0]:
                best[j] = (cost, i)
    cuts = []
    j = n
    while j > 0:
        i = best[j][1]
        cuts.append((i, j))
        j = i
    out = []
    for i, j in reversed(cuts):
        idxs = [k for nb in nbs[i:j] for k in pads[nb]]
        out.append((nbs[j - 1], sorted(idxs)))
    return out


def bucketize_blocks(
    U_rows: Sequence[np.ndarray],
    D_rows: Sequence[np.ndarray],
    d0_rows: Sequence[np.ndarray],
) -> tuple[list[np.ndarray], list[np.ndarray], list[np.ndarray]]:
    """Stack per-observable (w,k)/(w,w)/(w,) blocks into bucketed padded tensors.

    Padded rows get identity covariance and zero residual (contribute exactly
    0 to the log-likelihood). Returns three lists aligned with
    ``bucket_layout`` order: U (n_obs_b, nb, k), D (n_obs_b, nb, nb),
    d0 (n_obs_b, nb).
    """
    widths = [u.shape[0] for u in U_rows]
    k = U_rows[0].shape[1]
    Us, Ds, d0s = [], [], []
    for nb, idxs in bucket_layout(widths):
        U_pad = np.zeros((len(idxs), nb, k))
        D_pad = np.tile(np.eye(nb), (len(idxs), 1, 1))
        d0_pad = np.zeros((len(idxs), nb))
        for r, i in enumerate(idxs):
            w = widths[i]
            U_pad[r, :w] = U_rows[i]
            D_pad[r, :w, :w] = D_rows[i]
            d0_pad[r, :w] = d0_rows[i]
        Us.append(U_pad)
        Ds.append(D_pad)
        d0s.append(d0_pad)
    return Us, Ds, d0s


@struct.dataclass
class EmulatorLikelihood:
    """Precomputed state for the jitted log-posterior. mode is static."""

    groups: tuple[GroupGPs, ...]
    theta_min: jax.Array  # (d,)
    theta_max: jax.Array  # (d,)
    # block mode tensors: one entry per size bucket (see bucket_layout)
    U: tuple[jax.Array, ...]   # each (n_obs_b, nb, k_total)
    D: tuple[jax.Array, ...]   # each (n_obs_b, nb, nb) constant covariance (+ data errors, padded diag=1)
    d0: tuple[jax.Array, ...]  # each (n_obs_b, nb)     constant residual offset (m0 - y), padded 0
    # lowrank mode tensors
    wb: WoodburyNormal | None
    mode: str = struct.field(pytree_node=False, default="block")

    # ----------------------------------------------------------------------------
    def gp_eval(self, theta: jax.Array) -> tuple[jax.Array, jax.Array]:
        """PC-space means and variances for all groups, concatenated: (W, k_total).

        Every group's stacked GPs share the analysis design matrix, so the
        shared-sqdiff batched predict applies (gp.predict_all_shared) — the
        per-dim difference tensor is computed once per group, not per PC.
        (A fused Pallas predict kernel was A/B'd on-device 2026-08-18 and
        LOST to this XLA path — see NOTES.md "fused GP predict"; don't
        re-attempt without new evidence.)
        """
        zs, vs = [], []
        for g in self.groups:
            z, v = gp_mod.predict_all_shared(g.cfg, g.posts, theta)
            zs.append(z)
            vs.append(v)
        return jnp.concatenate(zs, axis=1), jnp.concatenate(vs, axis=1)

    def log_likelihood(self, theta: jax.Array) -> jax.Array:
        z, v = self.gp_eval(theta)
        if self.mode == "block":
            from bayesian_inference_tpu.ops.pallas_mvn import fused_block_mvn_loglike

            # One kernel per size bucket does residual + covariance assembly +
            # Cholesky + loglike in VMEM — no (W, n_obs, nb, nb) tensor ever
            # hits HBM.
            ll = None
            for U_b, D_b, d0_b in zip(self.U, self.D, self.d0):
                term = fused_block_mvn_loglike(U_b, D_b, d0_b, z, v)
                ll = term if ll is None else ll + term
            return ll
        if self.mode == "lowrank":
            return woodbury_loglike(self.wb, z, v)
        raise ValueError(f"unknown likelihood mode {self.mode}")

    def log_posterior(self, theta: jax.Array) -> jax.Array:
        """(W, d) -> (W,). Uniform box prior; -inf outside."""
        inside = jnp.all((theta > self.theta_min) & (theta < self.theta_max), axis=-1)
        theta_safe = jnp.clip(theta, self.theta_min, self.theta_max)
        ll = self.log_likelihood(theta_safe)
        return jnp.where(inside, ll, -jnp.inf)

    def log_posterior_with_d0(self, d0, theta: jax.Array) -> jax.Array:
        """log_posterior with the residual offset swapped for ``d0``.

        The closure-test batch (one pseudodata vector per validation point)
        differs ONLY in d0, so P independent closure MCMCs vmap over this
        function inside one compiled sampler program. ``d0`` is mode-shaped:
        block mode takes the bucketed tuple layout of ``self.d0``; lowrank
        mode takes a flat (n_features,) residual, from which the d0-dependent
        Woodbury pieces (b, c0) rebuild against the cached d0-independent
        factorization (ops/mvn.py::WoodburyNormal.with_d0) — the rebuild is
        loop-invariant in the sampler scan, so XLA hoists it out of the chain.
        """
        if self.mode == "block":
            return self.replace(d0=d0).log_posterior(theta)
        if self.mode == "lowrank":
            return self.replace(wb=self.wb.with_d0(d0)).log_posterior(theta)
        raise ValueError(f"unknown likelihood mode {self.mode}")


def pad_residual_offsets(
    emulation_config,
    emulation_results: dict[str, dict[str, Any]],
    y_batch: np.ndarray,
) -> tuple[np.ndarray, ...]:
    """Bucketed padded residual offsets d0 = m0 - y for a batch of data vectors.

    ``y_batch`` is (P, n_features); returns a tuple of (P, n_obs_b, nb) arrays
    laid out exactly like EmulatorLikelihood.d0 (same bucket_layout and numpy
    ops as build_likelihood, so a batched closure run is bit-identical to P
    sequential builds).
    """
    slice_map = emulator_mod.GroupSliceMap.learn(emulation_config)
    y_batch = np.atleast_2d(np.asarray(y_batch, float))
    assert y_batch.shape[1] == slice_map.n_features

    m0_group = {
        name: np.asarray(emulation_results[name]["PCA"]["mean"])
        for name in emulation_config.emulation_groups_config
    }
    widths = [e[2].stop - e[2].start for e in slice_map.entries]
    P = y_batch.shape[0]
    out = []
    for nb, idxs in bucket_layout(widths):
        d0_pad = np.zeros((P, len(idxs), nb))
        for r, i in enumerate(idxs):
            _label, gname, g_slice, grp_slice = slice_map.entries[i]
            d0_pad[:, r, : widths[i]] = (
                m0_group[gname][grp_slice][None, :] - y_batch[:, g_slice]
            )
        out.append(d0_pad)
    return tuple(out)


def residual_offsets_flat(
    emulation_config,
    emulation_results: dict[str, dict[str, Any]],
    y_batch: np.ndarray,
) -> np.ndarray:
    """Flat residual offsets d0 = m0 - y, shape (P, n_features).

    Lowrank-mode analogue of ``pad_residual_offsets``: same slice-map entries
    and numpy ops as build_likelihood's d0_full assembly, so a batched lowrank
    closure run rebuilds bit-identical Woodbury (b, c0) per point.
    """
    slice_map = emulator_mod.GroupSliceMap.learn(emulation_config)
    y_batch = np.atleast_2d(np.asarray(y_batch, float))
    assert y_batch.shape[1] == slice_map.n_features
    m0_group = {
        name: np.asarray(emulation_results[name]["PCA"]["mean"])
        for name in emulation_config.emulation_groups_config
    }
    d0 = np.zeros_like(y_batch)
    for _label, gname, g_slice, grp_slice in slice_map.entries:
        d0[:, g_slice] = m0_group[gname][grp_slice][None, :] - y_batch[:, g_slice]
    return d0


def build_likelihood(
    emulation_config,
    emulation_results: dict[str, dict[str, Any]],
    experimental_results: dict[str, np.ndarray],
    theta_min: Sequence[float],
    theta_max: Sequence[float],
    emulator_cov_unexplained: dict[str, np.ndarray] | None = None,
    mode: str = "block",
    dtype=None,
) -> EmulatorLikelihood:
    """Assemble the on-device likelihood from host artifacts.

    The truncation covariance enters UNDIVIDED (the reference's production MCMC
    evaluates one walker per call, so its /n_samples factor is /1 — see
    models/emulator.py docstring).
    """
    if dtype is None:
        dtype = jax.dtypes.canonicalize_dtype(np.float64)
    np_dtype = np.dtype(str(dtype))

    def to_device(x):
        # Cast on HOST then device_put: an on-device cast would compile one
        # tiny convert program per distinct shape (seconds each on a remote
        # compile service); a pure transfer compiles nothing.
        return jax.device_put(np.asarray(x, np_dtype))

    if emulator_cov_unexplained is None:
        emulator_cov_unexplained = emulator_mod.compute_emulator_cov_unexplained(
            emulation_config, emulation_results
        )

    slice_map = emulator_mod.GroupSliceMap.learn(emulation_config)
    y = np.asarray(experimental_results["y"], float)
    y_err = np.asarray(experimental_results["y_err"], float)
    assert y.shape[0] == slice_map.n_features

    # Per-group host-side reconstruction pieces
    group_names = list(emulation_config.emulation_groups_config)
    offsets: dict[str, int] = {}
    U_group: dict[str, np.ndarray] = {}
    m0_group: dict[str, np.ndarray] = {}
    sigma_group: dict[str, np.ndarray] = {}
    k_total = 0
    host_posts = []
    for name in group_names:
        cfg_g = emulation_config.emulation_groups_config[name]
        art = emulation_results[name]
        kernel_cfg, posts = emulator_mod.posterior_from_artifact(art, device=False)
        host_posts.append((kernel_cfg, posts))

        n_pc = cfg_g.n_pc
        S_k = np.asarray(art["PCA"]["components"])[:n_pc]  # (k_g, F_g)
        scale = np.asarray(art["PCA"]["scale"])
        mean = np.asarray(art["PCA"]["mean"])
        U_group[name] = S_k.T * scale[:, None]             # (F_g, k_g): unscaled low-rank factor
        m0_group[name] = mean
        sigma_group[name] = emulator_cov_unexplained[name] * np.outer(scale, scale)
        offsets[name] = k_total
        k_total += n_pc

    # ---- block-mode bucketed padded tensors ---------------------------------------
    U_rows, D_rows, d0_rows = [], [], []
    for label, gname, g_slice, grp_slice in slice_map.entries:
        w = g_slice.stop - g_slice.start
        off, k_g = offsets[gname], U_group[gname].shape[1]
        U_i = np.zeros((w, k_total))
        U_i[:, off : off + k_g] = U_group[gname][grp_slice]
        U_rows.append(U_i)
        D_rows.append(sigma_group[gname][grp_slice, grp_slice] + np.diag(y_err[g_slice] ** 2))
        d0_rows.append(m0_group[gname][grp_slice] - y[g_slice])
    U_bkts, D_bkts, d0_bkts = bucketize_blocks(U_rows, D_rows, d0_rows)

    # ---- lowrank-mode global tensors ---------------------------------------------
    wb = None
    if mode == "lowrank":
        F = slice_map.n_features
        U_full = np.zeros((F, k_total))
        D_full = np.diag(y_err**2).astype(float)
        d0_full = np.zeros(F)
        for label, gname, g_slice, grp_slice in slice_map.entries:
            off, k_g = offsets[gname], U_group[gname].shape[1]
            U_full[g_slice, off : off + k_g] = U_group[gname][grp_slice]
            d0_full[g_slice] = m0_group[gname][grp_slice] - y[g_slice]
        # constant part: full per-group truncation covariance at group rows/cols
        for gname in group_names:
            rows = [
                (g_slice, grp_slice)
                for label, g, g_slice, grp_slice in slice_map.entries
                if g == gname
            ]
            for gs_i, grp_i in rows:
                for gs_j, grp_j in rows:
                    D_full[gs_i, gs_j] += sigma_group[gname][grp_i, grp_j]
        wb = build_woodbury(jnp.asarray(D_full, dtype), jnp.asarray(U_full, dtype), jnp.asarray(d0_full, dtype))

    # Fuse groups with identical kernel structure into ONE stacked GP batch:
    # z/v columns stay in group order (matching the U column offsets), but the
    # device sees a single batched matmul over all 41 PCs instead of one
    # launch per group. Fusion happens on HOST (numpy) so the device sees a
    # single transfer, no eager concat compiles.
    groups: list[GroupGPs] = []
    if len(host_posts) > 1 and all(c == host_posts[0][0] for c, _ in host_posts[1:]):
        fused = jax.tree.map(
            lambda *xs: to_device(np.concatenate(xs, axis=0)),
            *(p for _, p in host_posts),
        )
        groups = [GroupGPs(cfg=host_posts[0][0], posts=fused)]
    else:
        for kernel_cfg, posts in host_posts:
            groups.append(GroupGPs(cfg=kernel_cfg, posts=jax.tree.map(to_device, posts)))

    return EmulatorLikelihood(
        groups=tuple(groups),
        theta_min=to_device(theta_min),
        theta_max=to_device(theta_max),
        U=tuple(to_device(u) for u in U_bkts),
        D=tuple(to_device(d) for d in D_bkts),
        d0=tuple(to_device(d) for d in d0_bkts),
        wb=wb,
        mode=mode,
    )
