"""Profiling / tracing hooks (SURVEY.md section 5: the reference has none; we
provide jax.profiler traces + stage wall-clock).

Usage:
    biq-steer -c config.yaml --profile output/trace
or programmatically:
    with device_trace("output/trace"):
        run_mcmc(...)
Traces open in Perfetto / TensorBoard's profile plugin.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace around a block (no-op when trace_dir is None)."""
    if not trace_dir:
        yield
        return
    logger.info(f"Writing device trace to {trace_dir}")
    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up in the device trace and logs wall-clock."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    logger.info(f"[trace:{name}] {time.perf_counter() - t0:.3f}s")
