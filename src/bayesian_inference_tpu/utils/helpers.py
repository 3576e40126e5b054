"""Logging / progress utilities (reference: helpers.py, common_base.py)."""

from __future__ import annotations

import logging
import sys
import time
from contextlib import contextmanager


def setup_logging(level: int = logging.INFO) -> None:
    """Configure root logging with module names, preferring rich when available."""
    try:
        from rich.logging import RichHandler

        handler: logging.Handler = RichHandler(show_path=False)
        fmt = "%(name)s: %(message)s"
    except ImportError:
        handler = logging.StreamHandler(sys.stderr)
        fmt = "%(asctime)s %(levelname)s %(name)s: %(message)s"
    logging.basicConfig(level=level, format=fmt, handlers=[handler], force=True)
    logging.captureWarnings(True)


@contextmanager
def stage_timer(name: str, logger: logging.Logger):
    """Log wall-clock for a pipeline stage."""
    t0 = time.perf_counter()
    logger.info(f"[{name}] starting...")
    try:
        yield
    finally:
        logger.info(f"[{name}] done in {time.perf_counter() - t0:.2f}s")
