"""Shared machinery for the RL CLIs (run_mansy / run_simple_rl).

Covers what tianshou's Collector/Trainer + the reference env CSV loggers did:
split resolution -> device tables, vectorized evaluation over the cartesian
test grid, episode-log CSV writing in the reference's exact format
(reference ``envs/mansy_env.py:271-290``), and the summary table printer
(reference ``utils/common.py:196-218``).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.config import Config
from mansy_immersivevideostreaming_tpu.sim.env import (
    generate_environment_samples, generate_environment_test_samples, reset_env,
    step_env,
)
from mansy_immersivevideostreaming_tpu.sim.tables import SimTables, build_sim_tables
from mansy_immersivevideostreaming_tpu.utils.logging import ascii_table

# Fallback upper bound on episode length in chunks (Jin2022: videos <= 60 s,
# start at chunk 6).  Prefer episode_step_bound(tables), which derives the
# bound from the actual data so longer datasets (e.g. Wu2017) work.
MAX_EPISODE_STEPS = 60


def episode_step_bound(tables: SimTables) -> int:
    """Max steps an episode can take: last chunk - first downloaded chunk + 1."""
    return int(np.asarray(tables.end_chunk).max()) - tables.startup_download


def first_done_mask(done: np.ndarray) -> np.ndarray:
    """[T, N] done flags -> mask selecting each lane's FIRST episode end."""
    first = np.zeros_like(done)
    seen = np.zeros(done.shape[1], bool)
    for t in range(done.shape[0]):
        first[t] = done[t] & ~seen
        seen |= done[t]
    return first


def build_split(config: Config, dataset: str, network_dataset: str, mode: str,
                qoe_weights: Sequence[Sequence[float]],
                test_grid: bool = False):
    """Returns (tables, samples, videos, users, traces) for a split."""
    videos = list(config.video_split[dataset][mode])
    users = list(config.user_split[dataset][mode])
    traces = list(config.network_split[network_dataset][mode])
    tables = build_sim_tables(config, dataset, network_dataset, videos, users,
                              traces, qoe_weights)
    if test_grid:
        samples = generate_environment_test_samples(
            len(videos), len(users), len(traces), len(qoe_weights))
    else:
        samples = generate_environment_samples(
            len(videos), len(users), len(traces), len(qoe_weights))
    return tables, jnp.asarray(samples), videos, users, traces


def episode_log_rows(logs, videos: Sequence[int], users: Sequence[int],
                     traces: Sequence[int],
                     qoe_weights: Sequence[Sequence[float]]) -> List[str]:
    """Format finished-episode records as reference CSV rows
    (``mansy_env.py:277-284``: means rounded to 5 digits, qoe normalized)."""
    done = np.asarray(logs.done)
    video = np.asarray(logs.video)
    user = np.asarray(logs.user)
    trace = np.asarray(logs.trace)
    qoe_id = np.asarray(logs.qoe_id)
    qoe = np.asarray(logs.qoe)
    qoe1 = np.asarray(logs.qoe1)
    qoe2 = np.asarray(logs.qoe2)
    qoe3 = np.asarray(logs.qoe3)
    rows = []
    for t, n in np.argwhere(done):
        w = qoe_weights[int(qoe_id[t, n])]
        rows.append(
            f"{videos[int(video[t, n])]},{users[int(user[t, n])]},"
            f"{traces[int(trace[t, n])]},"
            f"{float(w[0])},{float(w[1])},{float(w[2])},"
            f"{round(float(qoe[t, n]), 5)},{round(float(qoe1[t, n]), 5)},"
            f"{round(float(qoe2[t, n]), 5)},{round(float(qoe3[t, n]), 5)}")
    return rows


def append_episode_logs(path: str, rows: List[str]) -> None:
    if not rows:
        return
    new = not os.path.exists(path)
    with open(path, "a", encoding="utf-8") as f:
        if new:
            f.write("video,user,trace,qoe_w1,qoe_w2,qoe_w3,qoe,qoe1,qoe2,qoe3\n")
        for r in rows:
            f.write(r + "\n")


def make_eval_fn(apply_fn: Callable, tables: SimTables, observe_fn: Callable,
                 deterministic: bool = False):
    """Jitted single-pass evaluator over a sub-sample table [n, 4]; build once
    and reuse across epochs (a fresh jit per call would recompile).

    ``deterministic`` selects argmax actions instead of sampling (tianshou's
    ``deterministic_eval`` option; the reference test loop samples)."""
    n_steps = episode_step_bound(tables)

    @jax.jit
    def run(params, sub, key):
        n = sub.shape[0]
        states = jax.vmap(lambda i: reset_env(tables, sub, i, n))(jnp.arange(n))

        def body(carry, _):
            states, key = carry
            key, k_act = jax.random.split(key)
            obs = jax.vmap(lambda s: observe_fn(tables, s))(states)
            logits, _ = apply_fn(params, obs)
            if deterministic:
                action = jnp.argmax(logits, axis=-1)
            else:
                action = jax.random.categorical(k_act, logits)
            new_states, _, done, log = jax.vmap(
                lambda s, a: step_env(tables, sub, s, a, n, False)
            )(states, action)
            return (new_states, key), log

        _, logs = jax.lax.scan(body, (states, key), None, length=n_steps)
        return logs

    return run


def evaluate(apply_fn: Callable, params, tables: SimTables,
             samples: jnp.ndarray, observe_fn: Callable, key: jax.Array,
             lane_chunk: int = 512, eval_fn: Callable | None = None,
             deterministic: bool = False):
    """Run every sample episode exactly once; returns per-chunk LogRecords
    plus per-sample first-done masks.

    Vectorized replacement for the reference's serial batch-of-1 test loop
    (reference ``run_mansy.py:161-175``): each sample gets a lane; lanes run
    to MAX_EPISODE_STEPS with auto-reset, and only each lane's first
    episode-end record is kept.  Pass ``eval_fn`` (from :func:`make_eval_fn`)
    to reuse the compiled evaluator across calls.
    """
    if eval_fn is None:
        eval_fn = make_eval_fn(apply_fn, tables, observe_fn, deterministic)
    S = samples.shape[0]
    all_logs = []
    all_masks = []
    for s0 in range(0, S, lane_chunk):
        sub = samples[s0: s0 + lane_chunk]
        n = sub.shape[0]
        logs = eval_fn(params, sub, jax.random.fold_in(key, s0))
        all_logs.append(logs)
        all_masks.append(first_done_mask(np.asarray(logs.done)))
    return all_logs, all_masks


def masked_log_rows(all_logs, all_masks, videos, users, traces, qoe_weights):
    """Format only each lane's first finished episode (mask from evaluate)."""
    rows: List[str] = []
    for logs, mask in zip(all_logs, all_masks):
        rows.extend(episode_log_rows(logs._replace(done=jnp.asarray(mask)),
                                     videos, users, traces, qoe_weights))
    return rows


def read_log_file(log_path: str) -> Dict[str, float]:
    """Print the reference's summary table and return the means
    (reference ``utils/common.py:196-218``)."""
    rows = []
    sums = np.zeros(4)
    with open(log_path, "r", encoding="utf-8") as f:
        f.readline()
        for line in f:
            parts = line.strip().split(",")
            video, user, trace = map(int, parts[:3])
            vals = list(map(float, parts[3:]))
            rows.append([video, user, trace] + vals)
            sums += np.asarray(vals[3:])
    n = len(rows)
    means = sums / n
    rows.append([-1, -1, -1, -1, -1, -1] + list(means))
    print(ascii_table(
        ["video", "user", "trace", "qoe_w1", "qoe_w2", "qoe_w3",
         "qoe", "qoe1", "qoe2", "qoe3"], rows))
    return {"qoe": means[0], "qoe1": means[1], "qoe2": means[2], "qoe3": means[3]}
