"""Pallas kernels vs reference jnp implementations (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.ops.geometry import batched_tile_occupancy
from mansy_immersivevideostreaming_tpu.ops.pallas_kernels import (
    mha_pallas, tile_occupancy_pallas,
)


def test_occupancy_kernel_matches_jnp():
    rng = np.random.default_rng(0)
    pos = rng.random((300, 2)).astype(np.float32)
    got = np.asarray(tile_occupancy_pallas(jnp.asarray(pos), interpret=True))
    want = np.asarray(batched_tile_occupancy(jnp.asarray(pos))).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_occupancy_kernel_edges():
    pos = np.array([[0.0, 0.0], [1.0, 1.0], [0.5, 0.5], [0.999, 0.001]],
                   np.float32)
    got = np.asarray(tile_occupancy_pallas(jnp.asarray(pos), interpret=True))
    want = np.asarray(batched_tile_occupancy(jnp.asarray(pos))).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def _ref_attention(q, k, v, mask):
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def test_mha_kernel_matches_reference():
    rng = np.random.default_rng(1)
    B, H, Lq, Lk, D = 2, 4, 16, 16, 32
    q = jnp.asarray(rng.normal(size=(B, H, Lq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    causal = jnp.tril(jnp.ones((Lq, Lk), bool))[None, None]
    got = mha_pallas(q, k, v, causal, interpret=True)
    want = _ref_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_mha_kernel_no_mask():
    rng = np.random.default_rng(2)
    B, H, L, D = 1, 2, 8, 16
    q = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    got = mha_pallas(q, k, v, None, interpret=True)
    want = _ref_attention(q, k, v, jnp.ones((1, 1, L, L), bool))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
