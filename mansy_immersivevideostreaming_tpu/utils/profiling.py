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


class _Timed:
    """Handle yielded by :func:`timed`; register outputs with ``watch`` so the
    timer blocks on the actual computation rather than an unrelated op."""

    def __init__(self):
        self._outputs = []
        self.seconds = None

    def watch(self, value):
        self._outputs.append(value)
        return value


@contextlib.contextmanager
def timed(label: str, sync: bool = True):
    """Wall-clock timing that blocks on the watched work.

    Usage::

        with timed("step") as t:
            out = t.watch(step(params, batch))

    Blocks on every array registered via ``t.watch`` (the real work); if
    nothing was watched it falls back to draining the device queue with a
    barrier op so async dispatch cannot fake a fast time.
    """
    handle = _Timed()
    t0 = time.time()
    yield handle
    if sync:
        if handle._outputs:
            jax.block_until_ready(handle._outputs)
        else:
            (jax.device_put(0.0) + 0).block_until_ready()
    handle.seconds = time.time() - t0
    print(f"[{label}] {handle.seconds:.3f}s", flush=True)
