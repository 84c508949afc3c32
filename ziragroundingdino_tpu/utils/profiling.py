"""Profiling + debugging harness.

Upgrades the reference's minimal instrumentation (SURVEY §5: wall-clock
timers + cuda.synchronize in the eval loop, `evaluation/evaluator.py:109-151`;
commented NaN probes in the transformer) to first-class TPU tooling:
  * `device_timer` — block_until_ready timing (the s/img harness);
  * `trace` — jax.profiler trace context for xprof/tensorboard;
  * `nan_guard` — jax.debug_nans / checkify-based NaN detection, replacing
    the reference's fp16 overflow print statements.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Callable, Dict, Iterable, Optional

import jax

logger = logging.getLogger("ziragroundingdino_tpu")


def enable_compilation_cache(path: str = "/tmp/zgdino_jax_cache") -> None:
    """Persistent XLA compilation cache: full-size GDINO-T compiles take
    60-370 s on TPU; caching them across processes makes repeated bench/eval/
    train invocations start in seconds. Safe to call multiple times."""
    import os

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # older jax: different knob names
        logger.info("compilation cache unavailable: %s", e)


@contextlib.contextmanager
def device_timer(name: str, results: Optional[Dict[str, float]] = None):
    """Wall time of the block with a device sync at the end (the
    torch.cuda.synchronize-equivalent the reference uses for 'pure compute
    time')."""
    t0 = time.perf_counter()
    yield
    (jax.device_put(0.0) + 0).block_until_ready()  # fence
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = results.get(name, 0.0) + dt
    logger.info("%s: %.1f ms", name, dt * 1000)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace (open in xprof/tensorboard-profile)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("profile written to %s", log_dir)


@contextlib.contextmanager
def nan_guard(enable: bool = True):
    """Raise on NaN production inside jitted code (debug runs only — forces
    sync per op). Replaces the reference's NaN print probes."""
    if not enable:
        yield
        return
    old = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def checkify_nans(fn: Callable) -> Callable:
    """checkify-wrapped fn: returns (err, out); err.throw() reports NaNs with
    location — usable inside jit unlike debug_nans."""
    from jax.experimental import checkify

    return checkify.checkify(fn, errors=checkify.float_checks)


class SmoothedValue:
    """`util/misc.py:33-97` equivalent: windowed median/avg tracker."""

    def __init__(self, window: int = 20):
        from collections import deque

        self.window = deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.window.append(value)
        self.total += value * n
        self.count += n

    @property
    def avg(self) -> float:
        return sum(self.window) / max(len(self.window), 1)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class MetricLogger:
    """`util/misc.py:248-360` equivalent."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = {}
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters.setdefault(k, SmoothedValue()).update(float(v))

    def __str__(self):
        return self.delimiter.join(
            f"{k}: {m.avg:.4f}" for k, m in self.meters.items()
        )

    def log_every(self, iterable: Iterable, print_freq: int, header: str = ""):
        t0 = time.time()
        for i, obj in enumerate(iterable):
            yield obj
            if i % print_freq == 0:
                logger.info("%s [%d] %s (%.1fs)", header, i, str(self), time.time() - t0)
