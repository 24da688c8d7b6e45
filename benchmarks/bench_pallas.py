"""Measure Pallas kernels vs plain-XLA equivalents on the real chip.

Decides VERDICT round-1 item 5: wire the kernels into production if they
win, delete them if they lose.  Prints a small table to stderr and a JSON
summary to stdout.

Usage: python benchmarks/bench_pallas.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def bench_mha(B=512, H=8, Lq=16, Lk=16, Dh=64):
    from mansy_immersivevideostreaming_tpu.ops.pallas_kernels import mha_pallas

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, H, Lq, Dh))
    k = jax.random.normal(k2, (B, H, Lk, Dh))
    v = jax.random.normal(k3, (B, H, Lk, Dh))
    mask = jnp.tril(jnp.ones((Lq, Lk), bool))[None, None]

    @jax.jit
    def xla(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (Dh ** 0.5)
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    pallas = jax.jit(lambda q, k, v: mha_pallas(q, k, v, mask))
    t_x = timeit(xla, q, k, v)
    t_p = timeit(pallas, q, k, v)
    np.testing.assert_allclose(np.asarray(xla(q, k, v)),
                               np.asarray(pallas(q, k, v)), atol=2e-5)
    return t_x, t_p


def bench_occupancy(B=65536):
    from mansy_immersivevideostreaming_tpu.ops.geometry import batched_tile_occupancy
    from mansy_immersivevideostreaming_tpu.ops.pallas_kernels import (
        tile_occupancy_pallas)

    pos = jax.random.uniform(jax.random.PRNGKey(1), (B, 2))
    xla = jax.jit(batched_tile_occupancy)
    pallas = jax.jit(tile_occupancy_pallas)
    t_x = timeit(xla, pos)
    t_p = timeit(pallas, pos)
    np.testing.assert_array_equal(np.asarray(xla(pos)).astype(np.int32),
                                  np.asarray(pallas(pos)))
    return t_x, t_p


def bench_mtio_sample(bs=2048):
    """End-to-end inference (the export path) with and without use_pallas."""
    from mansy_immersivevideostreaming_tpu.models.mtio import ViewportTransformerMTIO
    from mansy_immersivevideostreaming_tpu.models import vp_train

    h = jax.random.uniform(jax.random.PRNGKey(2), (bs, 5, 2))
    c = jax.random.uniform(jax.random.PRNGKey(3), (bs, 1, 2))
    times = {}
    for use_pallas in (False, True):
        model = ViewportTransformerMTIO(d_model=512, dim_feedforward=512,
                                        fut_window=15, use_pallas=use_pallas)
        optimizer = vp_train.make_optimizer(1e-4)
        state = vp_train.create_train_state(model, jax.random.PRNGKey(0), 5,
                                            optimizer)
        fn = jax.jit(lambda s, h, c: model.apply(
            {"params": s.params, "batch_stats": s.batch_stats}, h, c,
            method=ViewportTransformerMTIO.sample))
        times[use_pallas] = timeit(fn, state, h, c, iters=10)
    return times[False], times[True]


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    results = {}
    for name, fn in (("mha_fused_L16", bench_mha),
                     ("tile_occupancy_64k", bench_occupancy),
                     ("mtio_sample_bs2048", bench_mtio_sample)):
        t_x, t_p = fn()
        results[name] = {"xla_ms": round(t_x * 1e3, 3),
                         "pallas_ms": round(t_p * 1e3, 3),
                         "pallas_speedup": round(t_x / t_p, 3)}
        print(f"{name}: xla {t_x * 1e3:.3f} ms | pallas {t_p * 1e3:.3f} ms | "
              f"speedup {t_x / t_p:.2f}x", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
