"""Cross-platform AOT TPU lowering of the hot device programs.

The real TPU is reached through a tunnel with long/variable compile latency
(and outage windows), so kernel-breaking edits must be caught on the CPU test
host. jax's multi-platform lowering runs the full Pallas->Mosaic MLIR
generation for TPU without a device (this guard caught a dynamic_slice-on-
values bug in the blocked-Cholesky kernel during a TPU outage, 2026-08-18).

Runs in a subprocess: the checks need the production configuration (f32,
x64 off) — under the test suite's x64 mode the multi-platform lowering of the
sampler scan trips a jax-internal recursion.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def test_hot_programs_lower_for_tpu():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "check_tpu_lowering.py")],
        capture_output=True, text=True, timeout=420,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    assert "ALL TPU LOWERINGS OK" in proc.stdout
