"""Functional core of the streaming simulator.

Pure-function equivalents of the reference's stateful classes:

* ``NetworkTrace.simulate_download`` (reference
  ``bitrate_selection/simulators/network.py:22-35``): consume per-second
  throughput segments, wrapping cyclically over the trace.
* ``PlaybackBuffer.push_chunk`` (reference ``simulators/buffer.py:8-15``).

The network cursor keeps the integer second and the fractional part
separately (the reference uses one growing float; splitting keeps float32
precision constant over arbitrarily long sessions on TPU).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class NetState(NamedTuple):
    """Bandwidth-trace cursor (reference ``network.py:19-20``)."""
    idx: jnp.ndarray   # i32: index into the trace (wraps mod trace length)
    sec: jnp.ndarray   # i32: whole seconds elapsed
    frac: jnp.ndarray  # f32 in [0, 1): fraction of the current second used


def init_net_state() -> NetState:
    return NetState(idx=jnp.int32(0), sec=jnp.int32(0), frac=jnp.float32(0.0))


def simulate_download_bytes(bw_row: jnp.ndarray, bw_len: jnp.ndarray,
                            net: NetState, size: jnp.ndarray
                            ) -> Tuple[NetState, jnp.ndarray]:
    """Download ``size`` bytes; returns (new_state, download_time_seconds).

    Exact functional port of reference ``network.py:22-35``: while bytes
    remain, the remaining throughput of the current second is
    ``(1 - frac) * bw[idx]``; consuming it advances to the next second
    (wrapping ``idx`` cyclically, reference ``network.py:28``), otherwise the
    fractional cursor advances by ``size / bw[idx]``.
    """
    def cond(carry):
        _, _, _, s = carry
        return s > 0

    def body(carry):
        idx, sec, frac, s = carry
        rate = bw_row[idx]
        remain = (1.0 - frac) * rate
        full = s >= remain
        idx = jnp.where(full, (idx + 1) % bw_len, idx)
        sec = jnp.where(full, sec + 1, sec)
        new_frac = jnp.where(full, 0.0, frac + s / rate)
        s = jnp.where(full, s - remain, 0.0)
        return idx, sec, new_frac, s

    idx, sec, frac, _ = jax.lax.while_loop(
        cond, body, (net.idx, net.sec, net.frac, jnp.asarray(size, jnp.float32)))
    dt = (sec - net.sec).astype(jnp.float32) + (frac - net.frac)
    return NetState(idx=idx, sec=sec, frac=frac), dt


def push_chunk(buf_size: jnp.ndarray, chunk_length: float,
               download_time: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Playback buffer update; returns (new_buf_size, rebuffer_time).

    Matches reference ``buffer.py:8-15``: rebuffering occurs iff the download
    outlasts the buffer, in which case the buffer restarts at one chunk.
    """
    rebuf = jnp.maximum(0.0, download_time - buf_size)
    new_buf = jnp.where(download_time > buf_size,
                        chunk_length,
                        buf_size - download_time + chunk_length)
    return new_buf, rebuf


INIT_BUFFER_CHUNKS = 3.0  # reference ``buffer.py:6``: buffer starts at 3 chunks


def init_buffer(chunk_length: float) -> jnp.ndarray:
    return jnp.float32(INIT_BUFFER_CHUNKS * chunk_length)
