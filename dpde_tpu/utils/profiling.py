"""Tracing / profiling hooks (SURVEY.md section 5: the reference has only
ad-hoc perf_counter calls in notebooks; here profiling is a first-class
switch)."""

from __future__ import annotations

import contextlib
import logging
import time
from pathlib import Path

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def profile_trace(log_dir: str | Path | None):
    """jax.profiler trace context; no-op when log_dir is None.

    View with TensorBoard or xprof:  profile_trace('logs/profile')
    """
    if log_dir is None:
        yield
        return
    log_dir = str(log_dir)
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def phase_timer(name: str, metrics_run=None, step: int | None = None):
    """Wall-clock phase timing, logged and optionally sent to metrics."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        logger.info("[timing] %s: %.3fs", name, dt)
        if metrics_run is not None:
            metrics_run.log({f"time/{name}": dt}, step=step)


def enable_nan_debugging() -> None:
    """Debug-mode NaN checks (SURVEY.md section 5 'race detection /
    sanitizers' row): every jitted function re-runs un-jitted on NaN
    production and reports the primitive. Expensive; debug only."""
    jax.config.update("jax_debug_nans", True)
