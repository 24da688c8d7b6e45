"""Device-resident simulation tables.

The reference re-reads manifests/pickles from disk on every episode reset
(reference ``bitrate_selection/simulators/simulator.py:28-46`` constructs a
fresh ``Simulator`` per episode).  Here everything a rollout can touch is
pre-staged once as dense arrays keyed by (video, user, trace) *index* within a
split, so episode reset is an index select and thousands of simulator
instances can run under ``vmap``/``scan`` on a TPU core.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from mansy_immersivevideostreaming_tpu.config import Config
from mansy_immersivevideostreaming_tpu.data.manifest import load_manifest_tables
from mansy_immersivevideostreaming_tpu.data.network import load_network_tables
from mansy_immersivevideostreaming_tpu.data.prediction import load_prediction_tables
from mansy_immersivevideostreaming_tpu.sim.simulator import build_prefix


class SimTables(NamedTuple):
    """All static data a rollout needs, indexed by split-local ids."""
    # chunk tables
    sizes: jnp.ndarray        # f32 [V, C, R, T]
    qualities: jnp.ndarray    # f32 [V, C, R, T]
    # viewport tables
    gt: jnp.ndarray           # f32 [V, U, C, T]
    pred: jnp.ndarray         # f32 [V, U, C, T]
    vp_acc: jnp.ndarray       # f32 [V, U, C]
    start_chunk: jnp.ndarray  # i32 [V, U]
    end_chunk: jnp.ndarray    # i32 [V, U] (clamped to video length - 1;
                              # reference simulator.py:42)
    # bandwidth traces
    bw: jnp.ndarray           # f32 [N, L] bytes/sec
    bw_len: jnp.ndarray       # i32 [N]
    bw_prefix: jnp.ndarray    # f32 [N, L+1] cumulative bytes (inf past len)
    # qoe preferences
    qoe_weights: jnp.ndarray  # f32 [Q, 3]
    # streaming constants
    startup_download: int
    chunk_length: float
    max_rate: float
    max_size: float
    max_throughput: float
    video_rates: jnp.ndarray  # i32 [R]
    past_k: int
    action_space: int
    # optional deployable per-action profiling tables (extension; attached by
    # ``sim.expert.attach_action_values`` when exact env-side action-value
    # observation features are enabled): pyramid allocation AND quality/
    # variance evaluation both on the PREDICTED viewport — everything causally
    # available at decision time, unlike the expert's gt-evaluated tables
    # (reference ``expert_env.py:160-172``).
    av_quality: jnp.ndarray | None = None  # f32 [V, U, C, A]
    av_intra: jnp.ndarray | None = None    # f32 [V, U, C, A]
    av_size: jnp.ndarray | None = None     # f32 [V, U, C, A] bytes
    # out-of-prediction tables: when present, exact_action_values switches to
    # the accuracy-corrected estimate (sim.expert.corrected_scores)
    av_out_quality: jnp.ndarray | None = None  # f32 [V, U, C, A]
    av_out_intra: jnp.ndarray | None = None    # f32 [V, U, C, A]


def synthetic_sim_tables(num_videos: int = 2, num_users: int = 2,
                         num_traces: int = 2, num_chunks: int = 20,
                         num_qoe: int = 2, seed: int = 0) -> SimTables:
    """Small random tables with the real schema — for tests and hermetic
    multi-chip dry runs (no dataset tree required)."""
    rng = np.random.default_rng(seed)
    R, T = 5, 64
    rates = np.array([1, 5, 8, 16, 35], np.int32)
    qualities = np.broadcast_to(
        rates.astype(np.float32)[None, None, :, None],
        (num_videos, num_chunks, R, T)).copy()
    sizes = qualities * 1e6 / 8 / T * rng.uniform(
        0.5, 1.5, (num_videos, num_chunks, R, T)).astype(np.float32)
    vp = np.zeros((num_videos, num_users, num_chunks, T), np.float32)
    for v in range(num_videos):
        for u in range(num_users):
            for c in range(num_chunks):
                start = rng.integers(0, T - 8)
                vp[v, u, c, start:start + 8] = 1
    pred = vp.copy()
    start = np.full((num_videos, num_users), 3, np.int32)
    end = np.full((num_videos, num_users), num_chunks - 1, np.int32)
    bw = rng.uniform(5e5, 4e6, (num_traces, 50)).astype(np.float32)
    qoe = rng.uniform(1, 7, (num_qoe, 3)).astype(np.float32)
    return SimTables(
        sizes=jnp.asarray(sizes), qualities=jnp.asarray(qualities),
        gt=jnp.asarray(vp), pred=jnp.asarray(pred),
        vp_acc=jnp.ones((num_videos, num_users, num_chunks), jnp.float32),
        start_chunk=jnp.asarray(start), end_chunk=jnp.asarray(end),
        bw=jnp.asarray(bw),
        bw_len=jnp.full(num_traces, 50, jnp.int32),
        bw_prefix=build_prefix(bw, np.full(num_traces, 50, np.int32)),
        qoe_weights=jnp.asarray(qoe),
        startup_download=5, chunk_length=1.0, max_rate=35.0,
        max_size=500000.0, max_throughput=5000000.0,
        video_rates=jnp.asarray(rates), past_k=8, action_space=15)


def build_sim_tables(config: Config, dataset: str, network_dataset: str,
                     videos: Sequence[int], users: Sequence[int],
                     traces: Sequence[int],
                     qoe_weights: Sequence[Sequence[float]],
                     trace_scale=None) -> SimTables:
    """``trace_scale``: optional (up, low) min-max rescaling of every trace
    (reference ``Simulator.__init__`` trace_scale -> ``network.py:10-17``)."""
    mt = load_manifest_tables(config, dataset, videos)
    pt = load_prediction_tables(config, dataset, videos, users,
                                max_chunks=mt.sizes.shape[1])
    nt = load_network_tables(config, network_dataset, traces, scale=trace_scale)
    end = np.minimum(pt.end_chunk, (mt.video_length - 1)[:, None])
    return SimTables(
        sizes=jnp.asarray(mt.sizes),
        qualities=jnp.asarray(mt.qualities),
        gt=jnp.asarray(pt.gt.astype(np.float32)),
        pred=jnp.asarray(pt.pred.astype(np.float32)),
        vp_acc=jnp.asarray(pt.accuracy),
        start_chunk=jnp.asarray(pt.start_chunk),
        end_chunk=jnp.asarray(end.astype(np.int32)),
        bw=jnp.asarray(nt.throughput),
        bw_len=jnp.asarray(nt.length),
        bw_prefix=build_prefix(nt.throughput, nt.length),
        qoe_weights=jnp.asarray(np.asarray(qoe_weights, np.float32)),
        startup_download=config.startup_download,
        chunk_length=float(config.chunk_length),
        max_rate=float(config.video_rates[-1]),
        max_size=float(config.max_size),
        max_throughput=float(config.max_throughput),
        video_rates=jnp.asarray(np.asarray(config.video_rates, np.int32)),
        past_k=config.past_k,
        action_space=config.action_space,
    )
