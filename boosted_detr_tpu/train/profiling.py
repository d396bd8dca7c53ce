"""Profiling and observability utilities.

The reference's story is a TensorBoard callback + XLA JIT flag (SURVEY §5.1);
here profiling is first-class: jax.profiler trace contexts, a step-time /
images-per-sec meter (the BASELINE.json north-star metric), and compiled-cost
introspection (FLOPs / bytes from XLA's own cost analysis).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepMeter:
    """Images/sec + step-time meter with warmup skipping.

    NOTE (this environment): end timed regions with a host value fetch —
    jax.block_until_ready does not synchronize on the axon TPU tunnel.
    """

    def __init__(self, batch_size: int, warmup: int = 2):
        self.batch_size = batch_size
        self.warmup = warmup
        self._times = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    @property
    def step_time(self) -> float:
        steady = self._times[self.warmup:]
        return sum(steady) / len(steady) if steady else float("nan")

    @property
    def images_per_sec(self) -> float:
        st = self.step_time
        return self.batch_size / st if st == st and st > 0 else float("nan")

    def summary(self) -> Dict[str, float]:
        return {"step_time_ms": self.step_time * 1e3,
                "images_per_sec": self.images_per_sec,
                "steps_measured": len(self._times)}


def compiled_cost(fn: Callable, *args) -> Dict[str, float]:
    """XLA's own cost analysis of a jitted function: flops, bytes accessed."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return {"flops": float(analysis.get("flops", 0.0)),
            "bytes_accessed": float(analysis.get("bytes accessed", 0.0))}


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax.debug_nans (SURVEY §5.2 sanitizer parity): raises on the
    first NaN-producing op instead of at the loss check."""
    import jax

    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)
