"""Tile bitrate allocation and action codec (jittable, batched).

Reference behavior:

* 15-action <-> (rate_in, rate_out) codec — reference
  ``bitrate_selection/utils/common.py:101-139``.  Here: static lookup tables.
* "Pyramid" allocation — reference ``common.py:142-193``: tiles inside the
  predicted viewport get ``rate_in``; every other tile gets the rate version
  closest to ``video_rates[rate_out] // scale`` where ``scale`` is the BFS ring
  distance (8-neighbor, torus wrap) from the viewport set.

TPU reformulation: 8-neighbor BFS distance on a torus is the wrapped Chebyshev
distance to the nearest viewport tile, computable as a vectorized min over the
64x64 pairwise tile-distance table — no queue, no host loop.  The
scale -> rate-version map is a tiny static table precomputed at trace time
(scale on an 8x8 torus is at most 4).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Action codec tables; reference ``common.py:101-139``.  Index = action id.
ACTION_TO_RATES = np.array(
    [(1, 0), (2, 0), (3, 0), (4, 0), (2, 1), (3, 1), (4, 1), (3, 2), (4, 2),
     (4, 3), (0, 0), (1, 1), (2, 2), (3, 3), (4, 4)], dtype=np.int32)

_RATES_TO_ACTION = np.full((5, 5), 0, dtype=np.int32)
for _a, (_ri, _ro) in enumerate(ACTION_TO_RATES):
    _RATES_TO_ACTION[_ri, _ro] = _a


def action_to_rates(action: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """action id -> (rate_in, rate_out); reference ``common.py:101-119``."""
    table = jnp.asarray(ACTION_TO_RATES)
    pair = table[action]
    return pair[..., 0], pair[..., 1]


def rates_to_action(rate_in: jnp.ndarray, rate_out: jnp.ndarray) -> jnp.ndarray:
    """(rate_in, rate_out) -> action id; reference ``common.py:122-139``."""
    return jnp.asarray(_RATES_TO_ACTION)[rate_in, rate_out]


def _closest_rate_version(video_rates: Sequence[int], rate: float) -> int:
    """Closest rate version with ties going to the lower bitrate.

    Matches reference ``find_closest_rate_version`` (``common.py:170-180``):
    first index achieving the minimal gap wins (rates are ascending).
    """
    gaps = [abs(r - rate) for r in video_rates]
    best = 0
    for i, g in enumerate(gaps):
        if g < gaps[best]:
            best = i
    return best


@functools.lru_cache(maxsize=None)
def _scale_rate_table(video_rates: Tuple[int, ...], max_scale: int) -> np.ndarray:
    """Static table [num_rates(out), max_scale+1] -> rate version for outside
    tiles at BFS distance ``scale`` (scale >= 1); column 0 unused.
    Reference ``common.py:186-190``.
    """
    n = len(video_rates)
    table = np.zeros((n, max_scale + 1), dtype=np.int32)
    for out in range(n):
        for scale in range(1, max_scale + 1):
            table[out, scale] = _closest_rate_version(video_rates, video_rates[out] // scale)
    return table


@functools.lru_cache(maxsize=None)
def _torus_chebyshev_table(tile_num_height: int, tile_num_width: int) -> np.ndarray:
    """Pairwise wrapped-Chebyshev distance between all tiles.

    Equals the reference's 8-neighbor BFS ring distance on the torus
    (``common.py:156-168``): with 8-connectivity and wraparound, the BFS layer
    of a tile is max(wrapped |dy|, wrapped |dx|) to the nearest seed.
    Shape [T, T] with T = tile_num_height * tile_num_width.
    """
    h, w = tile_num_height, tile_num_width
    ys, xs = np.divmod(np.arange(h * w), w)
    dy = np.abs(ys[:, None] - ys[None, :])
    dy = np.minimum(dy, h - dy)
    dx = np.abs(xs[:, None] - xs[None, :])
    dx = np.minimum(dx, w - dx)
    return np.maximum(dy, dx).astype(np.int32)


def viewport_scales(pred_viewport: jnp.ndarray,
                    tile_num_width: int = 8, tile_num_height: int = 8) -> jnp.ndarray:
    """BFS ring distance ("scale") of each tile from the viewport set.

    pred_viewport: [..., T] 0/1 map (flattened).  Returns int32 [..., T].
    If the viewport is empty the reference leaves all scales at 0 (every tile
    then receives rate_in, ``common.py:184``); replicated here.

    Computed by separable 3x3 torus dilation: the 8-neighbor BFS layer equals
    the wrapped Chebyshev ring, and ``scale(t) = sum_r [t not yet covered
    after ring r]``.  O(rings * T) elementwise work instead of a [T, T]
    masked min — cheaper in the vmapped env hot path.
    """
    h, w = tile_num_height, tile_num_width
    grid = (pred_viewport > 0).reshape(pred_viewport.shape[:-1] + (h, w))
    max_scale = max(h // 2, w // 2)

    def dilate(c):
        d = c | jnp.roll(c, 1, axis=-1) | jnp.roll(c, -1, axis=-1)
        return d | jnp.roll(d, 1, axis=-2) | jnp.roll(d, -1, axis=-2)

    covered = grid
    scales = jnp.zeros(grid.shape, jnp.int32)
    for _ in range(max_scale):
        scales = scales + jnp.where(covered, 0, 1)
        covered = dilate(covered)
    scales = scales.reshape(pred_viewport.shape)
    any_inside = jnp.any(grid, axis=(-2, -1)).reshape(
        pred_viewport.shape[:-1] + (1,))
    return jnp.where(any_inside, scales, 0)


def allocate_tile_rates(rate_in: jnp.ndarray, rate_out: jnp.ndarray,
                        pred_viewport: jnp.ndarray,
                        video_rates: Sequence[int] = (1, 5, 8, 16, 35),
                        tile_num_width: int = 8,
                        tile_num_height: int = 8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pyramid allocation; returns (tile_rate_versions, tile_rates), both
    int32 [..., T].  Matches reference ``allocate_tile_rates``
    (``common.py:142-193``).

    ``rate_in``/``rate_out`` are scalar (or batched) rate-version indices.
    """
    video_rates = tuple(int(r) for r in video_rates)
    max_scale = max(tile_num_width // 2, tile_num_height // 2)
    scale_table = jnp.asarray(_scale_rate_table(video_rates, max_scale))
    rates_arr = jnp.asarray(np.array(video_rates, dtype=np.int32))

    scales = viewport_scales(pred_viewport, tile_num_width, tile_num_height)
    outside_version = scale_table[rate_out[..., None] if jnp.ndim(rate_out) else rate_out, scales]
    inside = scales == 0
    versions = jnp.where(inside, jnp.asarray(rate_in)[..., None] if jnp.ndim(rate_in) else rate_in,
                         outside_version).astype(jnp.int32)
    return versions, rates_arr[versions]


# Convenience batched form: actions [B], viewports [B, T] -> versions [B, T].
def allocate_for_actions(actions: jnp.ndarray, pred_viewports: jnp.ndarray,
                         video_rates: Sequence[int] = (1, 5, 8, 16, 35),
                         tile_num_width: int = 8,
                         tile_num_height: int = 8) -> jnp.ndarray:
    rate_in, rate_out = action_to_rates(actions)
    versions, _ = jax.vmap(
        lambda ri, ro, vp: allocate_tile_rates(ri, ro, vp, video_rates,
                                               tile_num_width, tile_num_height)
    )(rate_in, rate_out, pred_viewports)
    return versions
