"""Profiling helpers (SURVEY.md §5: the reference has none — only tqdm).

``trace`` wraps jax.profiler for one-shot TensorBoard traces;
``StepTimer`` measures steady-state step time with a host-transfer barrier
(on the axon TPU backend ``block_until_ready`` can return before execution
finishes, so a value fetch is the only reliable completion barrier).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Times a step function with warmup and a reliable barrier.

    ``fetch`` extracts a scalar from the step's output to force completion
    (default: assumes output is (state, metrics) and fetches a metric).
    """

    def __init__(self, warmup: int = 2,
                 fetch: Callable = None):
        self.warmup = warmup
        self.fetch = fetch or (lambda out: float(
            next(iter(out[1].values()))))

    def measure(self, step_fn, *args, steps: int = 10, **kwargs) -> float:
        out = None
        for _ in range(self.warmup):
            out = step_fn(*args, **kwargs)
        if out is not None:
            self.fetch(out)
        t0 = time.time()
        for _ in range(steps):
            out = step_fn(*args, **kwargs)
        self.fetch(out)
        return (time.time() - t0) / steps
