"""Independent numpy implementation of the Goodman & Weare (2010) stretch-move
ensemble sampler, used as a statistical reference for the on-chip sampler.

Written directly from the published algorithm (Goodman & Weare, CAMCS 5(1),
2010; the same algorithm emcee implements): two-half updates, partner drawn
from the complementary half, z ~ g(z) with g(z) proportional to 1/sqrt(z) on
[1/a, a], acceptance min(1, z^(d-1) p(Y)/p(X)).
"""

from __future__ import annotations

import numpy as np


def run_stretch_numpy(rng: np.random.Generator, log_prob, x0: np.ndarray, n_steps: int, a: float = 2.0):
    """Returns (chain (n_steps, W, d), log_prob (n_steps, W), acceptance (W,))."""
    x = np.array(x0, dtype=float)
    W, d = x.shape
    logp = np.array(log_prob(x), dtype=float, copy=True)
    chain = np.zeros((n_steps, W, d))
    logps = np.zeros((n_steps, W))
    n_acc = np.zeros(W)

    for t in range(n_steps):
        perm = rng.permutation(W)
        half = W // 2
        for first, second in ((perm[:half], perm[half:]), (perm[half:], perm[:half])):
            z = (1.0 + (a - 1.0) * rng.uniform(size=first.size)) ** 2 / a
            partners = second[rng.integers(0, second.size, size=first.size)]
            y = x[partners] + z[:, None] * (x[first] - x[partners])
            logp_y = np.array(log_prob(y), dtype=float, copy=True)
            log_ratio = (d - 1.0) * np.log(z) + logp_y - logp[first]
            accept = np.log(rng.uniform(size=first.size)) < log_ratio
            x[first[accept]] = y[accept]
            logp[first[accept]] = logp_y[accept]
            n_acc[first[accept]] += 1
        chain[t] = x
        logps[t] = logp
    return chain, logps, n_acc / n_steps
