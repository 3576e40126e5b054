"""Fit-schedule quality study: does a cheaper restart/halving/polish schedule
reach the same final LMLs? (VERDICT r4 next #2: fit <= 1.5 s.)

CPU x64 (exact arithmetic — schedule effects only, no precision effects), on
the real fixture at the production fit SHAPE class (N=200 design points,
ndim=6). For each candidate schedule, fits k PCs x (n_restarts+1) instances
from the SAME seeds as the baseline and reports the per-PC final-LML delta
vs the baseline schedule (halving_iters=15, keep=4, n_iters=60 — the bench
defaults). A schedule is adoptable when max |dLML| is < ~0.1 nat on every PC
over every seed (differences far below emulator-quality relevance; the
halving-rejected restarts were never going to win).

Cost column: iteration-instances relative to baseline at the PRODUCTION batch
(R=51 restarts, k=41 PCs) — what the TPU fit phase actually pays.

Usage: python scripts/probe_fit_quality.py [n_seeds]   (default 2; ~2 min/seed
per variant on a quiet host)
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "src"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from bayesian_inference_tpu.io import observables as obs_io
from bayesian_inference_tpu.models import gp_fit, pca as pca_mod
from bayesian_inference_tpu.ops.gram import KernelConfig

DATA = REPO / "tests" / "test_data"
N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
K_PC = 12
N_RESTARTS = 21

Y = obs_io.predictions_matrix_from_h5(str(DATA), "observables.h5")
X = np.asarray(obs_io.design_array_from_h5(str(DATA), "observables.h5"))
_, Y_pca = pca_mod.fit_pca(np.asarray(Y))
Y_pc = np.asarray(Y_pca)[:, :K_PC]

cfg = KernelConfig(nu=1.5, with_noise=True)
base_spec = gp_fit.spec_from_reference_config(
    cfg, param_min=X.min(axis=0), param_max=X.max(axis=0),
    n_restarts=N_RESTARTS, n_iters=60, alpha_jitter=1e-6,
)

# (label, overrides) — n_iters=total, halving at halving_iters, keep survivors
VARIANTS = [
    ("base_h15_k4_i60", {}),
    ("h15_k2_i60", {"halving_keep": 2}),
    ("h15_k3_i60", {"halving_keep": 3}),
    ("h10_k4_i60", {"halving_iters": 10}),
    ("h15_k4_i45", {"n_iters": 45}),
    ("h10_k3_i40", {"halving_iters": 10, "halving_keep": 3, "n_iters": 40}),
    ("h12_k3_i45", {"halving_iters": 12, "halving_keep": 3, "n_iters": 45}),
]

# Production-batch relative cost (R=51, k=41, baseline schedule)
def prod_cost(halving_iters=15, halving_keep=4, n_iters=60, **_):
    R, k = 51, 41
    return k * R * halving_iters + k * halving_keep * (n_iters - halving_iters)

base_cost = prod_cost()

results = {}
base_lml = {}
for seed in range(N_SEEDS):
    for label, ov in VARIANTS:
        spec = base_spec.replace(**ov)
        posts = gp_fit.fit_gps(spec, jnp.asarray(X), jnp.asarray(Y_pc), jax.random.key(seed))
        lml = np.asarray(posts.lml)
        if label.startswith("base"):
            base_lml[seed] = lml
        d = lml - base_lml[seed]
        results.setdefault(label, []).append(d)
        print(f"# seed {seed} {label}: max|dLML|={np.abs(d).max():.4g} "
              f"min(dLML)={d.min():.4g}", file=sys.stderr)

report = {
    "shape": {"N": int(X.shape[0]), "ndim": int(X.shape[1]), "k_pc": K_PC,
              "n_restarts": N_RESTARTS, "seeds": N_SEEDS},
    "variants": {
        label: {
            "cost_vs_base": round(prod_cost(**{**dict(halving_iters=15, halving_keep=4, n_iters=60), **ov}) / base_cost, 3),
            "max_abs_dlml": round(float(np.abs(np.stack(results[label])).max()), 6),
            "min_dlml": round(float(np.stack(results[label]).min()), 6),
        }
        for label, ov in VARIANTS
    },
}
print(json.dumps(report, indent=1))
