"""Measure the reference's CPU performance to anchor bench.py's vs_baseline.

Two workloads (BASELINE.md):

1. MTIO training throughput, samples/sec — runs the *actual reference model*
   (imported from /root/reference, torch CPU) through its train forward +
   backward + AdamW step on synthetic batches of the reference's shapes.
   A tiny ``munch`` shim satisfies the reference's config import.
2. ABR env-steps/sec — host-Python per-step simulation math (pyramid
   allocation BFS + trace download loop + QoE), equivalent to the reference
   env step without gym/tianshou overhead (upper-bounds the reference's real
   collection rate; gym/tianshou deps are not installed here).

Usage: python benchmarks/measure_baseline.py [--steps N]
"""

from __future__ import annotations

import argparse
import sys
import time
import types

import numpy as np


def measure_mtio_torch(steps: int = 6, bs: int = 512) -> float:
    # munch shim so the reference's utils.common imports
    munch = types.ModuleType("munch")

    class Munch(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    munch.Munch = Munch
    sys.modules.setdefault("munch", munch)
    sys.path.insert(0, "/root/reference/viewport_prediction")

    import torch
    from models.mtio import ViewportTransformerMTIO  # reference model

    torch.manual_seed(0)
    model = ViewportTransformerMTIO(
        in_channel=2, fut_window=15, d_model=512, dim_feedforward=512,
        num_encoder_layers=2, num_decoder_layers=2, device="cpu")
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    h = torch.rand(bs, 5, 2)
    c = torch.rand(bs, 1, 2)
    f = torch.rand(bs, 15, 2)
    # warmup
    pred, gt = model(h, c, f)
    loss = model.loss_function(pred, gt)
    opt.zero_grad(); loss.backward(); opt.step()
    t0 = time.time()
    for _ in range(steps):
        pred, gt = model(h, c, f)
        loss = model.loss_function(pred, gt)
        opt.zero_grad(); loss.backward(); opt.step()
    dt = time.time() - t0
    return steps * bs / dt


def measure_host_env_steps(n_steps: int = 2000) -> float:
    """Per-step host math: BFS pyramid allocation + cyclic-trace download +
    QoE — the exact work of reference ``mansy_env.step``/``simulator.py``."""
    import math
    from collections import deque

    rng = np.random.default_rng(0)
    rates = [1, 5, 8, 16, 35]
    bw = rng.uniform(5e5, 4e6, 531)
    sizes = rng.uniform(2e3, 6e4, (60, 5, 64)).astype(np.float32)
    quals = np.broadcast_to(np.array(rates, np.float32)[None, :, None],
                            (60, 5, 64)).copy()
    vps = np.zeros((60, 64), np.uint8)
    for c in range(60):
        s = rng.integers(0, 56)
        vps[c, s:s + 8] = 1

    def allocate(ri, ro, vp):
        vp8 = vp.reshape(8, 8)
        scales = np.zeros((8, 8), np.int32)
        seen = vp8.astype(bool).copy()
        q = deque([t for t in zip(*np.where(vp8 == 1))])
        while q:
            cy, cx = q.popleft()
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, -1), (1, 1), (-1, 1)):
                ny, nx = (cy + dy) % 8, (cx + dx) % 8
                if not seen[ny, nx]:
                    scales[ny, nx] = scales[cy, cx] + 1
                    seen[ny, nx] = True
                    q.append((ny, nx))
        versions = np.zeros((8, 8), np.int32)
        versions[scales == 0] = ri
        for s in range(1, scales.max() + 1):
            target = rates[ro] // s
            gaps = [abs(r - target) for r in rates]
            versions[scales == s] = int(np.argmin(gaps))
        return versions.reshape(-1)

    cur_t, cur_i, buf, prev_q = 0.0, 0, 3.0, None
    t_idx = np.arange(64)
    t0 = time.time()
    chunk = 6
    for i in range(n_steps):
        action = int(rng.integers(0, 15))
        ri = (action % 4) + 1
        ro = action % 3
        vp = vps[chunk % 60]
        versions = allocate(ri, ro, vp)
        sz = sizes[chunk % 60][versions, t_idx]
        q = quals[chunk % 60][versions, t_idx]
        size = float(np.sum(sz))
        start = cur_t
        while size > 0:
            remain = (math.floor(cur_t + 1) - cur_t) * bw[cur_i]
            if size >= remain:
                cur_i = (cur_i + 1) % len(bw)
                cur_t = math.floor(cur_t + 1)
                size -= remain
            else:
                cur_t += size / bw[cur_i]
                size = 0
        dt = cur_t - start
        if dt > buf:
            reb, buf = dt - buf, 1.0
        else:
            reb, buf = 0.0, buf - dt + 1.0
        vq = float(np.sum(vp * q) / np.sum(vp))
        intra = float(np.sum(vp * np.abs(q - vq)) / np.sum(vp)) / 35
        vqn = vq / 35
        inter = abs(vqn - prev_q) if prev_q is not None else 0.0
        prev_q = vqn
        _ = 7 * vqn - reb - (intra + inter)
        # history rolls as in the env
        chunk = 6 if chunk >= 59 else chunk + 1
    return n_steps / (time.time() - t0)


def measure_reference_env_steps(n_steps: int = 400) -> tuple:
    """Drive the reference's ACTUAL stack: its ``MANSYEnv`` + ``Simulator`` +
    ``NetworkTrace`` classes stepped by its torch ``Actor`` policy, batch-of-1,
    exactly like its serial test loop (``run_mansy.py:161-175``) and like one
    lane of its training Collector.  gym/munch/prettytable are not installed
    here, so minimal import shims stand in for them (the env only uses
    ``gym.Env`` as a base class and ``spaces.Discrete`` as a label — no gym
    logic runs); tianshou's Collector adds buffer bookkeeping on top, so this
    still slightly favors the reference.

    Returns (env+policy steps/s, env-only steps/s).
    """
    import os
    import types

    # ---- import shims for the reference's unavailable deps ----
    gym = types.ModuleType("gym")
    spaces = types.ModuleType("gym.spaces")

    class _Env:
        pass

    class _Discrete:
        def __init__(self, n):
            self.n = n

    gym.Env = _Env
    spaces.Discrete = _Discrete
    gym.spaces = spaces
    sys.modules.setdefault("gym", gym)
    sys.modules.setdefault("gym.spaces", spaces)

    munch = types.ModuleType("munch")

    class Munch(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    munch.Munch = Munch
    sys.modules.setdefault("munch", munch)

    prettytable = types.ModuleType("prettytable")

    class PrettyTable:
        def __init__(self, *a, **k):
            self.rows = []

        def add_row(self, row):
            self.rows.append(row)

        def __str__(self):
            return "\n".join(map(str, self.rows))

    prettytable.PrettyTable = PrettyTable
    sys.modules.setdefault("prettytable", prettytable)

    ref = "/root/reference/bitrate_selection"
    sys.path.insert(0, ref)
    cwd = os.getcwd()
    os.chdir(ref)  # config.yml uses ../datasets/ relative paths
    try:
        import torch
        from envs.mansy_env import MANSYEnv
        from models.mansy import Actor, FeatureNet
        from utils.common import get_config_from_yml

        config = get_config_from_yml("../config.yml")
        qoe_weights = [config.qoe_split["train"][i] for i in range(4)]
        env = MANSYEnv(config, "Jin2022", "4G", qoe_weights, identifier=None,
                       lamb=0.5, log_path="/tmp/ref_baseline_log.csv",
                       startup_download=config.startup_download, mode="train",
                       seed=1, worker_num=1, device="cpu", use_identifier=False)
        feature_net = FeatureNet(config.past_k, config.tile_total_num,
                                 len(config.video_rates), hidden_dim=128,
                                 device="cpu")
        actor = Actor(feature_net, 10 * 128, 128, config.action_space, "cpu")

        def policy_step(state):
            obs = {k: np.expand_dims(v, 0).astype(np.float32)
                   for k, v in state.items()}
            with torch.no_grad():
                logits, _ = actor(obs)
            return int(torch.argmax(logits, dim=-1).item())

        # warmup + steady-state measurement, auto-resetting across episodes
        state = env.reset()
        for _ in range(10):
            state, _, done, _ = env.step(policy_step(state))
            if done:
                state = env.reset()
        t0 = time.time()
        for _ in range(n_steps):
            state, _, done, _ = env.step(policy_step(state))
            if done:
                state = env.reset()
        full_rate = n_steps / (time.time() - t0)

        t0 = time.time()
        act = 0
        for i in range(n_steps):
            state, _, done, _ = env.step(act)
            act = (act + 1) % 15
            if done:
                state = env.reset()
        env_rate = n_steps / (time.time() - t0)
        return full_rate, env_rate
    finally:
        os.chdir(cwd)
        sys.path.remove(ref)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--skip-reference-stack", action="store_true")
    args = p.parse_args()
    env_rate = measure_host_env_steps()
    print(f"host_env_steps_per_sec: {env_rate:,.0f}")
    if not args.skip_reference_stack:
        try:
            full, env_only = measure_reference_env_steps()
            print(f"reference_stack_env_policy_steps_per_sec: {full:,.0f}")
            print(f"reference_stack_env_only_steps_per_sec: {env_only:,.0f}")
        except Exception as e:
            print(f"reference-stack measurement failed: {e!r}")
    mtio_rate = measure_mtio_torch(args.steps)
    print(f"torch_cpu_mtio_train_samples_per_sec: {mtio_rate:,.1f}")
