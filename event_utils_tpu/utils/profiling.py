"""Tracing / metrics utilities (aux subsystems the reference lacks,
SURVEY.md §5.1/§5.5): throughput meters, structured logging, profiler traces.
"""

from __future__ import annotations

import contextlib
import json
import logging
import sys
import time
from typing import Optional

from .util import format_power

logger = logging.getLogger("event_utils_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)
    # our handler owns the output: without this, an app that configures
    # root logging would see every line twice (module handler + root)
    logger.propagate = False


def _json_default(obj):
    """Best-effort serializer: metrics logging must never crash the loop."""
    if hasattr(obj, "tolist"):
        return obj.tolist()
    try:
        return float(obj)
    except (TypeError, ValueError):
        return str(obj)


def log_metrics(**metrics):
    """Emit one structured (JSON) metrics line."""
    logger.info("metrics %s", json.dumps(metrics, default=_json_default))


class ThroughputMeter:
    """Events-per-second meter with exponential smoothing.

    >>> meter = ThroughputMeter("voxelize")
    >>> with meter.measure(num_events=len(xs)):
    ...     events_to_voxel(...)
    >>> meter.rate_mevs
    """

    def __init__(self, name: str = "", alpha: float = 0.3):
        self.name = name
        self.alpha = alpha
        self.rate = 0.0  # events / second
        self.total_events = 0
        self.total_seconds = 0.0

    @contextlib.contextmanager
    def measure(self, num_events: int):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        inst = num_events / max(dt, 1e-12)
        self.rate = inst if self.rate == 0 else (
            self.alpha * inst + (1 - self.alpha) * self.rate)
        self.total_events += num_events
        self.total_seconds += dt

    @property
    def rate_mevs(self) -> float:
        return self.rate / 1e6

    def __repr__(self):
        val, unit = format_power(self.rate)
        return f"ThroughputMeter({self.name}: {val:.1f} {unit}ev/s)"


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around a block (view with
    tensorboard/xprof). Degrades to a wall-clock log if profiling is
    unavailable on the backend (e.g. over a device tunnel)."""
    import jax
    t0 = time.perf_counter()
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as exc:  # tunnel backends may not support profiling
        logger.warning("jax profiler unavailable (%s); timing only", exc)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                logger.info("trace written to %s", log_dir)
            except Exception:
                pass
        logger.info("traced block took %.3f s", time.perf_counter() - t0)


@contextlib.contextmanager
def timed(label: str):
    """Log wall-clock of a block."""
    t0 = time.perf_counter()
    yield
    logger.info("%s: %.3f s", label, time.perf_counter() - t0)
