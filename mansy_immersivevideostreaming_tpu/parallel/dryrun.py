"""Multi-chip sharding dry run: MTIO DP training + PPO rollout/update.

Single-process: jit the full training steps over an ``n_devices`` data mesh
(tiny shapes) and run one step each.  Multi-process (``--coordinator ...``):
the same steps over a mesh spanning every process's devices, proving the
DCN-style multi-host path (SURVEY §2.8) — ``jax.distributed.initialize`` +
global arrays + XLA collectives (Gloo on CPU, ICI/DCN on TPU pods).

Run directly as a worker::

    python -m mansy_immersivevideostreaming_tpu.parallel.dryrun \
        --n-devices 4 --coordinator localhost:9876 --num-processes 2 \
        --process-id 0

The reference has no distributed training at all; its parallelism is
``multiprocessing.Pool`` and tianshou ``SubprocVectorEnv`` (SURVEY §2.8).
This framework's scaling strategy is SPMD data/env parallelism: batches
(MTIO) and env lanes (PPO) shard over the mesh's ``data`` axis, parameters
and tables replicate, XLA inserts the gradient psums.  TP/PP/SP are
intentionally not used — the models are <10M params with <=21-token
sequences, so sharding anything but the batch axis would only add
collective latency.
"""

from __future__ import annotations

import numpy as np


def run_dryrun(n_devices: int) -> None:
    """One MTIO DP train step + one PPO collect/update over a data mesh.

    Works single- or multi-process: ``n_devices`` is the GLOBAL device
    count; all host data is staged via :func:`parallel.mesh.global_put`
    so shardings may span non-addressable devices.
    """
    import jax
    import jax.numpy as jnp

    from mansy_immersivevideostreaming_tpu.models.mtio import ViewportTransformerMTIO
    from mansy_immersivevideostreaming_tpu.models import vp_train
    from mansy_immersivevideostreaming_tpu.models.abr_nets import MansyActorCritic
    from mansy_immersivevideostreaming_tpu.parallel.mesh import (
        data_parallel_sharding, global_put, make_mesh, replicate, shard_batch,
    )
    from mansy_immersivevideostreaming_tpu.rl import ppo as ppo_mod
    from mansy_immersivevideostreaming_tpu.rl.rollout import (
        init_lanes, make_collector,
    )
    from mansy_immersivevideostreaming_tpu.rl.types import RunningStat
    from mansy_immersivevideostreaming_tpu.sim.env import (
        generate_environment_samples, observe_mansy,
    )
    from mansy_immersivevideostreaming_tpu.sim.tables import synthetic_sim_tables

    assert jax.device_count() >= n_devices, (
        f"need {n_devices} devices, have {jax.device_count()}")
    mesh = make_mesh(n_devices)
    repl = replicate(mesh)
    dp = data_parallel_sharding(mesh)
    nproc = jax.process_count()
    tag = (f"{n_devices} devices x {nproc} processes"
           if nproc > 1 else f"{n_devices} devices")

    def put(tree, sharding):
        return jax.tree_util.tree_map(
            lambda x: global_put(np.asarray(x), sharding), tree)

    # ---- 1. MTIO data-parallel training step -----------------------------
    model = ViewportTransformerMTIO(d_model=32, dim_feedforward=32, fut_window=4)
    optimizer = vp_train.make_optimizer(1e-4)
    state = vp_train.create_train_state(model, jax.random.PRNGKey(0),
                                        his_window=5, optimizer=optimizer)
    state = put(state, repl)
    B = 4 * n_devices
    batch = {
        "history": jnp.zeros((B, 5, 2), jnp.float32),
        "current": jnp.zeros((B, 1, 2), jnp.float32),
        "future": jnp.zeros((B, 4, 2), jnp.float32),
    }
    batch = shard_batch(mesh, batch)
    state, loss = vp_train.train_step(model, optimizer, state, batch,
                                      put(jax.random.PRNGKey(1), repl))
    assert np.isfinite(float(loss))
    print(f"[dryrun] MTIO DP train step OK on {tag}: loss={float(loss):.4f}",
          flush=True)

    # ---- 2. PPO rollout + update with env lanes sharded over the mesh ----
    # build tables/samples/lane states locally first (identical on every
    # process — deterministic), then stage them globally
    local_tables = synthetic_sim_tables()
    local_samples = jnp.asarray(generate_environment_samples(2, 2, 2, 2))
    tables = put(local_tables, repl)
    samples = put(local_samples, repl)
    policy = MansyActorCritic(hidden_dim=32)
    obs0 = {
        "throughput": jnp.zeros((2, 8)), "next_chunk_size": jnp.zeros((2, 5, 64)),
        "next_chunk_quality": jnp.zeros((2, 5, 64)),
        "pred_viewport": jnp.zeros((2, 64)), "rates_inside": jnp.zeros((2, 8)),
        "rates_outside": jnp.zeros((2, 8)), "viewport_acc": jnp.zeros((2, 8)),
        "buffer": jnp.zeros((2, 1)), "qoe_weight": jnp.zeros((2, 3)),
        "action_one_hot": jnp.zeros((2, 15)),
        "past_viewport_qualities": jnp.zeros((2, 8)),
        "past_quality_variances": jnp.zeros((2, 8)),
        "past_rebuffering": jnp.zeros((2, 8)),
    }
    params = put(policy.init(jax.random.PRNGKey(2), obs0)["params"], repl)
    apply_fn = lambda p, o: policy.apply({"params": p}, o)

    n_lanes = 2 * n_devices
    collect = make_collector(apply_fn, observe_mansy, tables, samples,
                             n_lanes, n_steps=4, train=True)
    states = put(init_lanes(local_tables, local_samples, n_lanes), dp)
    final_states, traj, logs, last_values = collect(
        params, states, put(jax.random.PRNGKey(3), repl))
    opt = ppo_mod.make_optimizer(5e-4)
    opt_state = put(opt.init(jax.device_get(params)), repl)
    cfg = ppo_mod.PPOConfig(minibatch=8, repeat=1)
    params, opt_state, rms, metrics = ppo_mod.ppo_update(
        apply_fn, opt, cfg, params, opt_state, traj, traj.reward, last_values,
        RunningStat.init(), put(jax.random.PRNGKey(4), repl))
    assert np.isfinite(float(metrics["loss"]))
    print(f"[dryrun] PPO rollout+update OK on {tag}: "
          f"loss={float(metrics['loss']):.4f}", flush=True)


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n-devices", type=int, required=True,
                        help="GLOBAL device count for the mesh")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port for jax.distributed.initialize")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--force-cpu", action="store_true",
                        help="run on virtual CPU devices (the worker path)")
    args = parser.parse_args(argv)

    import jax
    if args.force_cpu:
        # the env var alone is overridden by platform sitecustomizations;
        # the config update must happen before first backend use
        jax.config.update("jax_platforms", "cpu")
    if args.coordinator is not None:
        from mansy_immersivevideostreaming_tpu.parallel.mesh import init_distributed
        init_distributed(args.coordinator, args.num_processes, args.process_id)
    run_dryrun(args.n_devices)


if __name__ == "__main__":
    main()
