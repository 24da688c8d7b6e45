"""Viewport geometry kernels (jittable, batched).

TPU-native reformulation of the reference's host-side geometry:

* periodic (wrap-around) MSE — reference
  ``viewport_prediction/utils/common.py:73-80``
* torus position clamp — reference ``common.py:61-70``
* FoV -> 8x8 tile occupancy — reference ``common.py:46-58`` plus the 9-case
  wrap-around rectangle decomposition in ``common.py:83-127``.

The 9-case branch ladder collapses to a branchless separable form: the FoV is
an axis-aligned box on a torus, its wrapped x-extent is a union of at most two
pixel intervals, likewise y, and the marked tile set is exactly the Cartesian
product of the per-axis covered-tile unions (each reference case emits every
cross pair of its x/y sub-intervals).  Per axis we compute an 8-wide boolean
coverage vector with pure arithmetic, then take the outer product.  The whole
thing is elementwise -> vmap/VPU friendly, no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FOV_WIDTH = 600
FOV_HEIGHT = 300


def periodic_mse(a: jnp.ndarray, b: jnp.ndarray, dimension: int = 2) -> jnp.ndarray:
    """Mean square error respecting the periodicity of viewport positions.

    Matches reference ``viewport_prediction/utils/common.py:73-80``: per
    coordinate the error is ``min(|a-b|, |a+1-b|, |a-1-b|)``; result is the sum
    of squared errors over the last axis divided by ``dimension``.
    """
    err = jnp.abs(a - b)
    err = jnp.minimum(err, jnp.abs(a + 1.0 - b))
    err = jnp.minimum(err, jnp.abs(a - 1.0 - b))
    return jnp.sum(err * err, axis=-1) / dimension


def wrap_position(values: jnp.ndarray) -> jnp.ndarray:
    """Bound positions within [0, 1]^2 by torus wrap.

    Matches reference ``common.py:61-70`` exactly, including its use of
    truncation toward zero (``.to(torch.int)``): for v < 0 the result is
    ``v - trunc(v) + 1`` and for v > 1 it is ``v - trunc(v)``.
    """
    trunc = jnp.trunc(values)
    out = jnp.where(values < 0, values - trunc + 1.0, values)
    out = jnp.where(values > 1, values - trunc, out)
    return out


def _tile_of_point(p: jnp.ndarray, tile_size: int) -> jnp.ndarray:
    """Tile index containing pixel coordinate ``p`` (int), with the reference's
    boundary rule: a point exactly on a tile boundary belongs to the lower tile
    (reference ``common.py:37-43``).  For p >= 0 this is max(0, ceil(p/ts)-1).
    """
    return jnp.maximum(0, (p + tile_size - 1) // tile_size - 1)


def _axis_coverage(lo: jnp.ndarray, hi: jnp.ndarray, size: int, tile_size: int,
                   num_tiles: int) -> jnp.ndarray:
    """Boolean coverage over ``num_tiles`` tiles for the wrapped interval
    [lo, hi] on a circle of circumference ``size`` (pixel units, ints).

    ``lo`` may be negative and ``hi`` may exceed ``size`` (never both: the FoV
    is smaller than the frame).  Decomposition mirrors the reference's region
    split (``common.py:83-127``): a wrapping interval becomes [0, b] U [a, size].
    """
    wraps_left = lo < 0
    wraps_right = hi > size
    # Interval 1: [0, hi] if wraps_left, [0, hi % size] if wraps_right, else [lo, hi].
    i1_lo = jnp.where(wraps_left | wraps_right, 0, lo)
    i1_hi = jnp.where(wraps_right, hi - size, hi)
    # Interval 2 (only when wrapping): [lo % size, size] / [lo, size].
    i2_lo = jnp.where(wraps_left, lo + size, lo)
    i2_valid = wraps_left | wraps_right

    t = jnp.arange(num_tiles)
    c1 = (t >= _tile_of_point(i1_lo, tile_size)) & (t <= _tile_of_point(i1_hi, tile_size))
    c2 = i2_valid & (t >= _tile_of_point(i2_lo, tile_size)) & (t <= _tile_of_point(jnp.asarray(size), tile_size))
    return c1 | c2


def tile_occupancy(x: jnp.ndarray, y: jnp.ndarray,
                   video_width: int = 2560, video_height: int = 1440,
                   tile_num_width: int = 8, tile_num_height: int = 8,
                   fov_width: int = FOV_WIDTH, fov_height: int = FOV_HEIGHT) -> jnp.ndarray:
    """Tiles covered by a ``fov_width x fov_height`` FoV centered at pixel
    (x, y); returns uint8 of shape [tile_num_height, tile_num_width].

    Bit-equivalent to reference ``find_tiles_covered_by_viewport``
    (``common.py:46-58``) for x in [0, W], y in [0, H].
    """
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    tile_w = video_width // tile_num_width
    tile_h = video_height // tile_num_height
    cov_x = _axis_coverage(x - fov_width // 2, x + fov_width // 2,
                           video_width, tile_w, tile_num_width)
    cov_y = _axis_coverage(y - fov_height // 2, y + fov_height // 2,
                           video_height, tile_h, tile_num_height)
    return (cov_y[:, None] & cov_x[None, :]).astype(jnp.uint8)


def tile_occupancy_from_normalized(pos: jnp.ndarray,
                                   video_width: int = 2560, video_height: int = 1440,
                                   tile_num_width: int = 8, tile_num_height: int = 8,
                                   fov_width: int = FOV_WIDTH,
                                   fov_height: int = FOV_HEIGHT) -> jnp.ndarray:
    """Occupancy map from a normalized (x, y) in [0,1]^2 (last axis size 2).

    Pixel conversion matches reference ``predict.py:40-44`` /
    ``results.py:15-18``: ``int(v * W)`` i.e. truncation toward zero.
    Returns flattened uint8[tile_num_height * tile_num_width].
    """
    x = (pos[..., 0] * video_width).astype(jnp.int32)
    y = (pos[..., 1] * video_height).astype(jnp.int32)
    occ = tile_occupancy(x, y, video_width, video_height,
                         tile_num_width, tile_num_height, fov_width, fov_height)
    return occ.reshape(-1)


# Batched versions (vmapped over leading axes).
batched_tile_occupancy = jax.vmap(tile_occupancy_from_normalized)


def iou_accuracy(gt_map: jnp.ndarray, pred_map: jnp.ndarray) -> jnp.ndarray:
    """Tile-IoU between two occupancy bitmaps (last axis = tiles).

    Matches reference ``predict.py:46`` / ``results.py:21``.
    """
    inter = jnp.sum((gt_map & pred_map).astype(jnp.float32), axis=-1)
    union = jnp.sum((gt_map | pred_map).astype(jnp.float32), axis=-1)
    return inter / union


def tile_metrics(gt_map: jnp.ndarray, pred_map: jnp.ndarray):
    """(accuracy, recall, precision, f1) from occupancy maps.

    Matches reference ``results.py:21-31`` including f1=0 when
    recall+precision==0.
    """
    gt = gt_map.astype(jnp.float32)
    pred = pred_map.astype(jnp.float32)
    tp = jnp.sum(gt * pred, axis=-1)
    union = jnp.sum(jnp.clip(gt + pred, 0, 1), axis=-1)
    accuracy = tp / union
    fp = jnp.sum(pred, axis=-1) - tp
    fn = jnp.sum(gt, axis=-1) - tp
    recall = tp / (tp + fn)
    precision = tp / (tp + fp)
    denom = recall + precision
    f1 = jnp.where(denom == 0, 0.0, 2.0 * recall * precision / jnp.where(denom == 0, 1.0, denom))
    return accuracy, recall, precision, f1
