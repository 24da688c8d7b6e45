"""Profiling helpers (the reference has only wall-clock prints; SURVEY §5).

``trace(...)`` wraps a block in a named ``jax.profiler`` trace annotation;
``profile_to(dir)`` captures a TensorBoard-viewable device profile.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture a device profile into ``log_dir`` (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sync: bool = True):
    """Wall-clock timing with optional device sync."""
    t0 = time.time()
    yield
    if sync:
        (jax.device_put(0.0) + 0).block_until_ready()
    print(f"[{label}] {time.time() - t0:.3f}s", flush=True)
