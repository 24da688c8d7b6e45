"""MPC expert CLI: demonstration generation + direct evaluation.

TPU-native equivalent of reference ``bitrate_selection/run_expert.py``.  The
reference fans episodes out over a ``multiprocessing.Pool`` and runs a
50,625-sequence Python loop per chunk (``run_expert.py:68-73``,
``expert_env.py:358-422``); here episodes run as vmapped lanes and the
sequence search is a single vmapped scan on device.

Demonstrations are saved as plain numpy pytrees
``{(video, user, trace, qoe_weights): {"obs": {...}, "act": [...]}}`` —
structurally equivalent to the reference's pickled tianshou ReplayBuffers
(``run_expert.py:35-39``) without the tianshou dependency.

Examples::

    python -m mansy_immersivevideostreaming_tpu.cli.run_expert \
        --train-dataset Jin2022 --train --valid --horizon 4
    python -m mansy_immersivevideostreaming_tpu.cli.run_expert \
        --test-dataset Jin2022 --test --horizon 2 --qoe-test-ids 3 --test-on-seen
"""

from __future__ import annotations

import argparse
import os
import pickle
import time

import numpy as np

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.config import load_config
from mansy_immersivevideostreaming_tpu.rl import runner
from mansy_immersivevideostreaming_tpu.sim.env import (
    observe_mansy, reset_env, step_env, viewport_acc_estimate,
)
from mansy_immersivevideostreaming_tpu.sim.expert import (
    ExpertTables, action_sequences, attach_action_values, build_expert_tables,
    causal_bw_estimate, choose_action, deployable_etables,
)
from mansy_immersivevideostreaming_tpu.utils.prng import enable_compilation_cache, seed_everything


def _tables_fingerprint(tables) -> str:
    """Content hash so a stale cache is never silently reused (the
    reference's class-level cache relied on build-before-fork ordering only,
    ``expert_env.py:19-28``)."""
    import hashlib
    h = hashlib.sha256()
    for arr in (tables.sizes, tables.qualities, tables.gt, tables.pred):
        a = np.asarray(arr)
        h.update(str(a.shape).encode())
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:16]


def get_expert_tables(tables, cache_path: str, refresh: bool) -> ExpertTables:
    """Build or load the profiling tables (reference caches them to a pickle,
    ``expert_env.py:100-110``), keyed by a content fingerprint."""
    fp = _tables_fingerprint(tables)
    if cache_path and os.path.exists(cache_path) and not refresh:
        with open(cache_path, "rb") as f:
            payload = pickle.load(f)
        if (isinstance(payload, dict) and payload.get("fingerprint") == fp
                and len(payload["tables"]) == len(ExpertTables._fields)):
            print("Load expert cache from", cache_path)
            return ExpertTables(*(jnp.asarray(v) for v in payload["tables"]))
        print("Expert cache stale (fingerprint or schema mismatch) — rebuilding")
    t0 = time.time()
    et = build_expert_tables(tables)
    print(f"Profiled expert tables in {time.time() - t0:.1f}s")
    if cache_path:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        with open(cache_path, "wb") as f:
            pickle.dump({"fingerprint": fp,
                         "tables": [np.asarray(v) for v in et]}, f)
        print("Save expert cache at", cache_path)
    return et


def run_expert_episodes(tables, etables, samples, horizon: int,
                        lane_chunk: int = 64, collect_obs: bool = False,
                        causal: bool = False, acc_correct: bool = False):
    """Run each sample's episode once under the MPC expert.

    Returns a list of per-chunk results: (logs, first_done_mask, obs?, acts?).
    ``causal``: use the causal harmonic-bandwidth expert
    (``sim.expert.causal_bw_estimate``) instead of the reference's
    privileged true-future-trace rollout — the causally reachable MPC
    ceiling, this framework's diagnostic (no reference analogue).
    ``acc_correct``: score rollouts with the accuracy-corrected deployable
    quality/variance estimate (``sim.expert.corrected_scores`` at the lane's
    own ``sim.env.viewport_acc_estimate``) instead of the search tables'
    ground-truth-viewport evaluation.
    """
    seqs = jnp.asarray(action_sequences(horizon, int(tables.action_space)))
    S = samples.shape[0]
    n_steps = runner.episode_step_bound(tables)

    # One compiled search graph shared by every full-size lane chunk (a jit
    # inside the loop would recompile the 15^h-sequence MPC search per chunk).
    @jax.jit
    def run(sub):
        n = sub.shape[0]
        states = jax.vmap(lambda i: reset_env(tables, sub, i, n))(jnp.arange(n))

        def body(states, _):
            obs = jax.vmap(lambda s: observe_mansy(tables, s))(states)
            actions = jax.vmap(
                lambda s: choose_action(
                    tables, etables, s, seqs,
                    bw_hat=(causal_bw_estimate(tables, s) if causal
                            else None),
                    acc_hat=(viewport_acc_estimate(s.past_acc)
                             if acc_correct else None)))(states)
            new_states, _, done, log = jax.vmap(
                lambda s, a: step_env(tables, sub, s, a, n, False)
            )(states, actions)
            payload = (actions, done, log) + ((obs,) if collect_obs else ())
            return new_states, payload

        _, payload = jax.lax.scan(body, states, None, length=n_steps)
        return payload

    out = []
    for s0 in range(0, S, lane_chunk):
        sub = samples[s0: s0 + lane_chunk]
        payload = run(sub)
        actions, done, log = payload[0], payload[1], payload[2]
        first = runner.first_done_mask(np.asarray(done))
        out.append((log, first, np.asarray(actions),
                    payload[3] if collect_obs else None))
    return out


def create_demonstrations(args, config, qoe_weights, models_dir, demos_dir,
                          cache_path, mode="train"):
    log_path = os.path.join(models_dir, f"{mode}_log.csv")
    demo_path = os.path.join(demos_dir, f"{mode}_demonstrations.pkl")
    if os.path.exists(log_path):
        os.remove(log_path)

    tables, samples, videos, users, traces = runner.build_split(
        config, args.train_dataset, args.network_dataset, mode, qoe_weights)
    if args.demo_samples and mode == "train":
        # widen the train demo grid past the reference's round-robin cap
        # (--demo-samples; stratified coverage, see generate_demo_samples);
        # the valid set keeps the reference schedule — it only scores BC
        from mansy_immersivevideostreaming_tpu.sim.env import generate_demo_samples
        import jax.numpy as jnp
        samples = jnp.asarray(generate_demo_samples(
            len(videos), len(users), len(traces), len(qoe_weights),
            args.demo_samples, args.seed))
    etables = get_expert_tables(tables, cache_path, args.refresh_cache)
    if args.exact_action_values:
        # demo observations then include the exact 'action_values' field,
        # matching what the policy will observe at rollout/test time
        tables = attach_action_values(
            tables, etables,
            acc_correct=args.acc_correct or args.acc_correct_obs)
    if args.deployable_eval:
        etables = deployable_etables(etables)
    print("Total samples:", samples.shape[0])

    t0 = time.time()
    chunks = run_expert_episodes(tables, etables, samples, args.horizon,
                                 lane_chunk=args.lane_chunk, collect_obs=True,
                                 causal=args.causal_bw,
                                 acc_correct=args.acc_correct)
    demos = {}
    rows = []
    offset = 0
    for log, first, actions, obs in chunks:
        n = first.shape[1]
        for lane in range(n):
            ts = np.argwhere(first[:, lane])
            if len(ts) == 0:
                continue
            t_end = int(ts[0][0])
            sample = np.asarray(samples[offset + lane])
            key = (videos[sample[0]], users[sample[1]], traces[sample[2]],
                   tuple(int(w) for w in qoe_weights[sample[3]]))
            lane_obs = jax.tree_util.tree_map(
                lambda x: np.asarray(x)[: t_end + 1, lane], obs)
            demos[key] = {"obs": lane_obs, "act": actions[: t_end + 1, lane]}
        rows.extend(runner.masked_log_rows([log], [first], videos, users,
                                           traces, qoe_weights))
        offset += n
    runner.append_episode_logs(log_path, rows)
    os.makedirs(demos_dir, exist_ok=True)
    with open(demo_path, "wb") as f:
        pickle.dump(demos, f)
    print(f"Create {len(demos)} demonstrations, saved at {demo_path}, "
          f"cost {round((time.time() - t0) / 3600, 4)}h")


def test(args, config, qoe_weights, results_dir, cache_path):
    log_path = os.path.join(results_dir, "results.csv")
    if os.path.exists(log_path):
        os.remove(log_path)
    tables, samples, videos, users, traces = runner.build_split(
        config, args.test_dataset, args.network_dataset, "test", qoe_weights,
        test_grid=True)
    etables = get_expert_tables(tables, cache_path, args.refresh_cache)
    if args.deployable_eval:
        etables = deployable_etables(etables)
    t0 = time.time()
    chunks = run_expert_episodes(tables, etables, samples, args.horizon,
                                 lane_chunk=args.lane_chunk,
                                 causal=args.causal_bw,
                                 acc_correct=args.acc_correct)
    rows = []
    for log, first, _, _ in chunks:
        rows.extend(runner.masked_log_rows([log], [first], videos, users,
                                           traces, qoe_weights))
    runner.append_episode_logs(log_path, rows)
    print(f"Tested {len(rows)} episodes in {time.time() - t0:.1f}s")
    runner.read_log_file(log_path)


def run(args, config):
    seed_everything(args.seed)
    if args.qoe_train_ids is None:
        args.qoe_train_ids = list(range(len(config.qoe_split["train"])))
    split = "train" if args.test_on_seen else "test"
    if args.qoe_test_ids is None:
        args.qoe_test_ids = list(range(len(config.qoe_split[split])))

    models_dir = os.path.join(config.bs_models_dir, args.model,
                              args.train_dataset + "_" + args.network_dataset,
                              "qoe" + "_".join(map(str, args.qoe_train_ids)))
    demos_dir = models_dir
    seen = "seen" if args.test_on_seen else "unseen"
    results_dir = os.path.join(config.bs_results_dir, args.model,
                               args.test_dataset + "_" + args.network_dataset,
                               f"{seen}_qoe" + "_".join(map(str, args.qoe_test_ids)))
    train_cache = os.path.join(config.bs_models_dir, args.model,
                               f"{args.train_dataset}_cache.pkl")
    test_cache = os.path.join(config.bs_models_dir, args.model,
                              f"{args.test_dataset}_test_cache.pkl")
    os.makedirs(models_dir, exist_ok=True)
    os.makedirs(results_dir, exist_ok=True)

    if args.train:
        qoe_weights = [config.qoe_split["train"][i] for i in args.qoe_train_ids]
        print("Training QoE weights:", qoe_weights)
        create_demonstrations(args, config, qoe_weights, models_dir, demos_dir,
                              train_cache, "train")
    if args.valid:
        qoe_weights = [config.qoe_split["valid"][i] for i in args.qoe_train_ids]
        print("Validating QoE weights:", qoe_weights)
        create_demonstrations(args, config, qoe_weights, models_dir, demos_dir,
                              train_cache, "valid")
    if args.test:
        qoe_weights = [config.qoe_split[split][i] for i in args.qoe_test_ids]
        print("Testing QoE weights:", qoe_weights)
        test(args, config, qoe_weights, results_dir, test_cache)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="expert")
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--valid", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--test-on-seen", action="store_true")
    parser.add_argument("--train-dataset", type=str, default="Jin2022")
    parser.add_argument("--test-dataset", type=str, default="Jin2022")
    parser.add_argument("--network-dataset", type=str, default="4G")
    parser.add_argument("--qoe-train-ids", type=int, nargs="*")
    parser.add_argument("--qoe-test-ids", type=int, nargs="*")
    parser.add_argument("--proc-num", type=int, default=None,
                        help="accepted for reference-CLI compatibility "
                             "(episodes are vmapped lanes, not processes)")
    parser.add_argument("--lane-chunk", type=int, default=64,
                        help="episodes evaluated concurrently")
    parser.add_argument("--horizon", type=int, default=4)
    parser.add_argument("--causal-bw", action="store_true",
                        help="causal MPC: harmonic-mean bandwidth prediction "
                             "from observed throughput instead of the "
                             "privileged true future trace")
    parser.add_argument("--deployable-eval", action="store_true",
                        help="score the MPC search on the fully deployable "
                             "profiling tables (pred-allocated AND "
                             "pred-evaluated quality/variance) instead of "
                             "the gt-evaluated ones — with --causal-bw this "
                             "is a controller a real player could run")
    parser.add_argument("--acc-correct", action="store_true",
                        help="score the MPC search with the accuracy-"
                             "corrected deployable quality/variance estimate "
                             "(sim.expert.corrected_scores at the lane's own "
                             "observed prediction-accuracy history) — fully "
                             "causal, unlike the gt-evaluated tables")
    parser.add_argument("--acc-correct-obs", action="store_true",
                        help="accuracy-correct ONLY the exact action-value "
                             "obs field recorded in demos, leaving episode "
                             "scoring as selected by --deployable-eval/"
                             "--acc-correct (hybrid demo cores)")
    parser.add_argument("--exact-action-values", action="store_true",
                        help="(extension) record the exact causal one-step "
                             "action-value observation field in demos "
                             "(sim.env.exact_action_values), for policies "
                             "trained with the same flag")
    parser.add_argument("--demo-samples", type=int, default=0,
                        help="widen the demo grid to this many stratified "
                             "(video,user,trace,qoe) episodes (extension; "
                             "0 = reference round-robin schedule)")
    parser.add_argument("--refresh-cache", action="store_true")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--config-yml", type=str, default=None)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.device:
        jax.config.update("jax_platforms", args.device)
    enable_compilation_cache()
    print(args)
    config = load_config(args.config_yml)
    run(args, config)


if __name__ == "__main__":
    main()
