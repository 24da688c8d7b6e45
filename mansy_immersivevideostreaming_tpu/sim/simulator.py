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


def build_prefix(bw: jnp.ndarray, bw_len: jnp.ndarray) -> jnp.ndarray:
    """Per-trace cumulative-bytes table for the closed-form download.

    bw [N, L] (padding after ``bw_len`` ignored) -> prefix [N, L+1] with
    prefix[:, 0] = 0, prefix[:, i] = sum(bw[:, :i]) for i <= len, and +inf
    beyond the trace length so searchsorted never selects padding.
    """
    import numpy as np
    bw = np.asarray(bw, np.float64)
    lens = np.asarray(bw_len)
    N, L = bw.shape
    prefix = np.zeros((N, L + 1), np.float64)
    prefix[:, 1:] = np.cumsum(bw, axis=1)
    for i in range(N):
        prefix[i, lens[i] + 1:] = np.inf
    return jnp.asarray(prefix.astype(np.float32))


def simulate_download_prefix(bw_row: jnp.ndarray, prefix_row: jnp.ndarray,
                             bw_len: jnp.ndarray, net: NetState,
                             size: jnp.ndarray) -> Tuple[NetState, jnp.ndarray]:
    """Closed-form equivalent of :func:`simulate_download_bytes`.

    The sequential second-by-second walk (reference ``network.py:22-35``) is
    replaced by one cyclic prefix-sum searchsorted: O(log L) instead of up to
    ~50 lockstep iterations when traces contain outage (zero-byte) seconds.
    Matches the while-loop semantics except for float-rounding-level
    differences (< ~1e-3 s) and one measure-zero corner: if a download ends
    *exactly* at a second boundary followed by zero-bandwidth seconds, the
    cursor lands after the outage instead of before it.
    """
    L = bw_len
    total = prefix_row[L]
    rate0 = bw_row[net.idx]
    size = jnp.asarray(size, jnp.float32)
    avail0 = (1.0 - net.frac) * rate0
    full0 = size >= avail0
    # Case A: finishes inside the current second (matches the reference's
    # ``cur_time += size / rate`` arithmetic exactly).
    fracA = net.frac + size / rate0

    # Case B: consume the rest of this second, then whole seconds via the
    # cyclic prefix table.
    sp = size - avail0
    j0 = net.idx + 1  # may equal L (== position 0 of the next cycle)
    target = sp + prefix_row[j0]
    q = jnp.floor(target / total)
    rem = target - q * total
    q = jnp.where(rem >= total, q + 1, q)
    rem = jnp.where(rem >= total, rem - total, rem)
    q = jnp.where(rem < 0, q - 1, q)
    rem = jnp.where(rem < 0, rem + total, rem)
    # smallest r with prefix[r] > rem == #{i: prefix[i] <= rem}.  A parallel
    # comparison-sum beats the sequential binary search on TPU (the ~10
    # dependent gather rounds of a vmapped searchsorted are latency-bound).
    r = jnp.clip(jnp.sum(prefix_row <= rem), 1, L)
    n = (q.astype(jnp.int32) * L + r).astype(jnp.int32)
    n = jnp.maximum(n, j0)  # rounding guard; mathematically n > j0 - 1
    idxB = (n - 1) % L
    g_nm1 = total * ((n - 1) // L).astype(jnp.float32) + prefix_row[(n - 1) % L]
    remainder = jnp.maximum(target - g_nm1, 0.0)
    fracB = jnp.where(remainder > 0, remainder / bw_row[idxB], 0.0)
    m_adv = n - 1 - net.idx
    # exact-boundary case: only the first second was consumed
    exact0 = sp == 0
    idxB = jnp.where(exact0, j0 % L, idxB)
    m_adv = jnp.where(exact0, 1, m_adv)
    fracB = jnp.where(exact0, 0.0, fracB)

    new_idx = jnp.where(full0, idxB, net.idx)
    new_sec = jnp.where(full0, net.sec + m_adv, net.sec)
    new_frac = jnp.where(full0, fracB, fracA)
    dt = (new_sec - net.sec).astype(jnp.float32) + (new_frac - net.frac)
    return NetState(idx=new_idx, sec=new_sec, frac=new_frac), dt


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
