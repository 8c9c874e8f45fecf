"""Profiling hooks — the TPU-idiomatic observability the reference lacks
(SURVEY.md §5: the reference has only ad-hoc prints/ProgressBar).

``trace(logdir)`` wraps ``jax.profiler`` traces viewable in TensorBoard /
Perfetto; ``timed`` forces completion with a device fetch (the axon tunnel's
``block_until_ready`` does not wait, see bench.py).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

__all__ = ["trace", "timed", "annotate"]


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def timed(fn, *args, iters: int = 10, **kwargs):
    """Median wall time of ``fn`` with a forced host fetch per call."""
    out = fn(*args, **kwargs)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out
