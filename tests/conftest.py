"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding paths are
validated without TPU hardware) with x64 enabled so parity checks against
scipy/sklearn references are meaningful. TPU execution is exercised by
bench.py / __graft_entry__.py instead.
"""

import os

# Force CPU: the session environment pre-sets JAX_PLATFORMS to a TPU tunnel
# and pre-imports jax via sitecustomize, so plain env vars are too late —
# jax.config.update still applies because no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent XLA:CPU compilation cache: the heavy integration tests compile
# multi-second scan programs (full likelihood inlined); caching them makes
# repeat suite runs several minutes faster. Only multi-second compiles are
# persisted so the cache stays small. Keyed on HLO, so source edits that
# change the program invalidate entries naturally.
jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"

import pytest

from config_factory import _DATA_DIR, make_analysis_yaml  # noqa: E402,F401  (re-export)


@pytest.fixture(scope="session")
def test_data_dir() -> Path:
    return _DATA_DIR
