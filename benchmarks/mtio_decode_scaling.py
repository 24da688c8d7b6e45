"""Why is MTIO train MFU ~10%? Decode-step scaling evidence.

The MTIO train step runs fut_window(=15) sequential KV-cached decoder calls
(reference ``mtio.py:150-166``), each a handful of small [bs, d512] matmuls.
If wall time scales ~linearly with fut_window while FLOPs scale the same
way, the step is *latency-bound by the sequential decode chain*, not by a
framework inefficiency — i.e. this IS the roofline for the parity shapes.

Times the on-device epoch scan (one dispatch per 32 minibatches, hard host
sync) for fut_window in {1, 5, 15} at bs 512/d512 and prints per-step time,
FLOPs, and effective TFLOP/s.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/mtio_decode_scaling.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.models.mtio import ViewportTransformerMTIO
from mansy_immersivevideostreaming_tpu.models import vp_train

PEAK_FLOPS_V5E = 197e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(fut_window, bs=512, d_model=512, n_batches=32, min_seconds=6.0):
    model = ViewportTransformerMTIO(d_model=d_model, dim_feedforward=d_model,
                                    fut_window=fut_window)
    optimizer = vp_train.make_optimizer(1e-4)
    state = vp_train.create_train_state(model, jax.random.PRNGKey(0), 5,
                                        optimizer)
    key = jax.random.PRNGKey(1)
    n = bs * n_batches
    data = {
        "history": jax.random.uniform(key, (n, 5, 2)),
        "current": jax.random.uniform(key, (n, 1, 2)),
        "future": jax.random.uniform(key, (n, fut_window, 2)),
    }
    perm = jnp.arange(n)
    t0 = time.time()
    state, losses = vp_train.train_epoch(model, optimizer, state, data, bs,
                                         perm, key)
    float(losses[-1])
    log(f"[decode-scaling] fut={fut_window}: compile {time.time() - t0:.0f}s")
    epochs, t0 = 0, time.time()
    while True:
        state, losses = vp_train.train_epoch(model, optimizer, state, data,
                                             bs, perm, key)
        float(losses[-1])
        epochs += 1
        dt = time.time() - t0
        if dt >= min_seconds:
            break
    steps = epochs * n_batches
    batch = {k: v[:bs] for k, v in data.items()}
    ca = vp_train.train_step.lower(model, optimizer,
                                   jax.tree.map(jnp.copy, state), batch,
                                   key).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca["flops"])
    ms = dt / steps * 1e3
    tflops = flops * steps / dt / 1e12
    return {"fut_window": fut_window, "ms_per_step": round(ms, 3),
            "gflop_per_step": round(flops / 1e9, 2),
            "tflops_effective": round(tflops, 2),
            "mfu": round(tflops * 1e12 / PEAK_FLOPS_V5E, 4)}


def main():
    rows = [measure(f) for f in (1, 5, 15)]
    for r in rows:
        log(f"[decode-scaling] fut={r['fut_window']:>2}: "
            f"{r['ms_per_step']:.2f} ms/step, {r['gflop_per_step']} GFLOP, "
            f"{r['tflops_effective']} TFLOP/s eff, MFU {r['mfu'] * 100:.1f}%")
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
