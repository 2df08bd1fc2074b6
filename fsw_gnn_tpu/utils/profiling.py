"""Profiling / tracing helpers.

The reference's tracing is a pair of globals with cuda.synchronize
(fsw_embedding.py:118-119, 1150-1160).  TPU equivalent: `jax.profiler`
traces plus named scopes on the pipeline stages, and a simple wall-clock
section timer that forces device completion.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax


named_scope = jax.named_scope  # re-export: annotate pipeline stages


class SectionTimer:
    """Wall-clock section timer with block_until_ready semantics."""

    def __init__(self):
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def section(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def time_fn(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kwargs))
        self.records.setdefault(name, []).append(time.perf_counter() - t0)
        return out

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for k, v in self.records.items():
            out[k] = {'n': len(v), 'total_s': sum(v),
                      'mean_ms': 1e3 * sum(v) / len(v),
                      'min_ms': 1e3 * min(v)}
        return out


@contextlib.contextmanager
def trace(trace_dir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
