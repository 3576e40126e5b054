"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding paths are
validated without TPU hardware) with x64 enabled so parity checks against
scipy/sklearn references are meaningful. TPU execution is exercised by
bench.py / __graft_entry__.py instead.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

from pathlib import Path

import pytest


@pytest.fixture(scope="session")
def test_data_dir() -> Path:
    return Path(__file__).parent / "test_data"
