"""Shared host oracle for pyramid allocation (used by multiple test modules)."""

from collections import deque

import numpy as np

RATES = (1, 5, 8, 16, 35)


def oracle_bfs_scales(vp8x8):
    h, w = vp8x8.shape
    scales = np.zeros((h, w), np.int32)
    seen = vp8x8.astype(bool).copy()
    q = deque([t for t in zip(*np.where(vp8x8 == 1))])
    while q:
        cy, cx = q.popleft()
        for dy, dx in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, -1), (1, 1), (-1, 1)]:
            ny, nx = (cy + dy) % h, (cx + dx) % w
            if not seen[ny, nx]:
                scales[ny, nx] = scales[cy, cx] + 1
                seen[ny, nx] = True
                q.append((ny, nx))
    return scales


def oracle_closest(rate):
    best, gap = 0, abs(RATES[0] - rate)
    for i, r in enumerate(RATES):
        g = abs(r - rate)
        if g < gap:
            best, gap = i, g
    return best


def oracle_allocate(rate_in, rate_out, vp):
    vp8 = np.asarray(vp).reshape(8, 8)
    scales = oracle_bfs_scales((vp8 > 0).astype(np.uint8))
    versions = np.zeros((8, 8), np.int32)
    versions[scales == 0] = rate_in
    for s in range(1, scales.max() + 1):
        versions[scales == s] = oracle_closest(RATES[rate_out] // s)
    return versions.reshape(-1)
