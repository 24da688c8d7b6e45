"""Pallas TPU kernels for the framework's hot ops.

Two kernels:

* :func:`mha_pallas` — fused single-block multi-head attention
  (QK^T -> mask -> softmax -> PV in one VMEM pass).  The MTIO decode loop
  (reference ``mtio.py:150-166``) runs attention 15x per training step over
  short (<=32-token) sequences; one fused kernel per (batch, head) removes
  the intermediate [L, L] HBM round-trips.
* :func:`tile_occupancy_pallas` — batched FoV -> 8x8 tile occupancy
  (the predict.py export hot loop, reference ``predict.py:36-47``), pure VPU
  arithmetic on a [block, 64] layout.

Both fall back to ``interpret=True`` off-TPU so the same code path is
testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu",) or \
            jax.default_backend() in ("tpu",)
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Fused multi-head attention (short sequences; everything fits VMEM)
# ---------------------------------------------------------------------------

def _mha_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0]                      # [Lq, Dh]
    k = k_ref[0]                      # [Lk, Dh]
    v = v_ref[0]                      # [Lk, Dh]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask_ref[0], s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32)


def mha_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               mask: jnp.ndarray | None = None,
               interpret: bool | None = None) -> jnp.ndarray:
    """Fused attention.

    q [B, H, Lq, Dh], k/v [B, H, Lk, Dh]; mask broadcastable bool
    [B, H, Lq, Lk] (True = attend) or None.  Returns [B, H, Lq, Dh] f32.
    """
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    scale = 1.0 / (Dh ** 0.5)
    if interpret is None:
        interpret = not _on_tpu()
    if mask is None:
        mask = jnp.ones((B, H, Lq, Lk), bool)
    else:
        mask = jnp.broadcast_to(mask, (B, H, Lq, Lk))

    qf = q.reshape(B * H, Lq, Dh).astype(jnp.float32)
    kf = k.reshape(B * H, Lk, Dh).astype(jnp.float32)
    vf = v.reshape(B * H, Lk, Dh).astype(jnp.float32)
    mf = mask.reshape(B * H, Lq, Lk)

    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Lq, Dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, Dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, Dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq, Lk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Lq, Dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, Dh), jnp.float32),
        interpret=interpret,
    )(qf, kf, vf, mf)
    return out.reshape(B, H, Lq, Dh)


# ---------------------------------------------------------------------------
# Batched tile-occupancy
# ---------------------------------------------------------------------------

def _occupancy_kernel(x_ref, y_ref, o_ref, *, video_width, video_height,
                      tile_nw, tile_nh, fov_w, fov_h):
    x = x_ref[:]  # [Bblk, 1] i32 pixel coords
    y = y_ref[:]
    Bblk = x.shape[0]
    T = tile_nw * tile_nh
    col = jax.lax.broadcasted_iota(jnp.int32, (Bblk, T), 1)
    tx = col % tile_nw
    ty = col // tile_nw
    tw = video_width // tile_nw
    th = video_height // tile_nh

    def axis_cov(lo, hi, size, ts, t):
        wraps_l = lo < 0
        wraps_r = hi > size
        i1_lo = jnp.where(wraps_l | wraps_r, 0, lo)
        i1_hi = jnp.where(wraps_r, hi - size, hi)
        i2_lo = jnp.where(wraps_l, lo + size, lo)
        valid2 = wraps_l | wraps_r

        def tile_of(p):
            return jnp.maximum(0, (p + ts - 1) // ts - 1)

        c1 = (t >= tile_of(i1_lo)) & (t <= tile_of(i1_hi))
        c2 = valid2 & (t >= tile_of(i2_lo)) & (t <= tile_of(size))
        return c1 | c2

    cov_x = axis_cov(x - fov_w // 2, x + fov_w // 2, video_width, tw, tx)
    cov_y = axis_cov(y - fov_h // 2, y + fov_h // 2, video_height, th, ty)
    o_ref[:] = (cov_x & cov_y).astype(jnp.int32)


def tile_occupancy_pallas(pos: jnp.ndarray, video_width: int = 2560,
                          video_height: int = 1440, tile_nw: int = 8,
                          tile_nh: int = 8, fov_w: int = 600, fov_h: int = 300,
                          block: int = 256,
                          interpret: bool | None = None) -> jnp.ndarray:
    """pos [B, 2] normalized -> occupancy int32 [B, tile_nh*tile_nw].

    Same semantics as :func:`...ops.geometry.batched_tile_occupancy`.
    """
    if interpret is None:
        interpret = not _on_tpu()
    B = pos.shape[0]
    pad = (-B) % block
    x = (pos[:, 0] * video_width).astype(jnp.int32)
    y = (pos[:, 1] * video_height).astype(jnp.int32)
    if pad:
        x = jnp.pad(x, (0, pad))
        y = jnp.pad(y, (0, pad))
    n = x.shape[0]
    out = pl.pallas_call(
        functools.partial(_occupancy_kernel, video_width=video_width,
                          video_height=video_height, tile_nw=tile_nw,
                          tile_nh=tile_nh, fov_w=fov_w, fov_h=fov_h),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, tile_nw * tile_nh), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, tile_nw * tile_nh), jnp.int32),
        interpret=interpret,
    )(x[:, None], y[:, None])
    return out[:B]
