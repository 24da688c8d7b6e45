"""Per-preference QoE of every constant action on a test grid.

The reference has no such tool; its closest analogue is running the MPC
expert in test mode (``/root/reference/bitrate_selection/run_expert.py:84-109``)
per preference.  Here the vmapped simulator evaluates all 15 constant-action
policies over the full cartesian grid in one compiled evaluator: the
"policy" takes the action id as its parameters and emits one-hot logits, so
a single jit serves every action.

Output: per (action, preference) mean normalized QoE + components, and the
best fixed action per preference — the "bang-bang ceiling" that any learned
conditioned policy must beat to demonstrate graded behavior.

Usage::

    python benchmarks/fixed_action.py --mode test --device cpu
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.config import load_config
from mansy_immersivevideostreaming_tpu.ops.allocation import ACTION_TO_RATES
from mansy_immersivevideostreaming_tpu.rl import runner
from mansy_immersivevideostreaming_tpu.sim.env import observe_mansy
from mansy_immersivevideostreaming_tpu.utils.logging import ascii_table


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-dataset", default="Jin2022")
    p.add_argument("--network-dataset", default="4G")
    p.add_argument("--mode", default="test", choices=["valid", "test"])
    p.add_argument("--qoe-split", default="train", choices=["train", "test"],
                   help="train = seen preferences, test = unseen")
    p.add_argument("--device", default=None)
    p.add_argument("--out-csv", default=None)
    args = p.parse_args(argv)
    if args.device:
        jax.config.update("jax_platforms", args.device)
    config = load_config(None)

    qoe_weights = list(config.qoe_split[args.qoe_split])
    tables, samples, videos, users, traces = runner.build_split(
        config, args.train_dataset, args.network_dataset, args.mode,
        qoe_weights, test_grid=True)

    # "params" is the fixed action id; logits are a sharp one-hot so both
    # sampled and argmax evaluation pick it.
    def apply_fn(action_id, obs):
        n = obs["buffer"].shape[0]
        logits = jnp.where(jnp.arange(tables.action_space) == action_id,
                           30.0, -30.0)
        return jnp.broadcast_to(logits, (n, tables.action_space)), None

    eval_fn = runner.make_eval_fn(apply_fn, tables, observe_mansy,
                                  deterministic=True)
    n_prefs = len(qoe_weights)
    rows = []
    per_action = np.zeros((tables.action_space, n_prefs, 4))
    for a in range(tables.action_space):
        logs, masks = runner.evaluate(apply_fn, jnp.int32(a), tables, samples,
                                      observe_mansy, jax.random.PRNGKey(0),
                                      eval_fn=eval_fn)
        qoe_id = np.concatenate([np.asarray(l.qoe_id)[m]
                                 for l, m in zip(logs, masks)])
        vals = {k: np.concatenate([np.asarray(getattr(l, k))[m]
                                   for l, m in zip(logs, masks)])
                for k in ("qoe", "qoe1", "qoe2", "qoe3")}
        for q in range(n_prefs):
            sel = qoe_id == q
            per_action[a, q] = [vals[k][sel].mean()
                                for k in ("qoe", "qoe1", "qoe2", "qoe3")]
        rin, rout = ACTION_TO_RATES[a]
        rows.append([a, f"({rin},{rout})"] +
                    [round(float(per_action[a, q, 0]), 4)
                     for q in range(n_prefs)])

    headers = ["action", "(rin,rout)"] + [str(tuple(w)) for w in qoe_weights]
    print(ascii_table(headers, rows))
    best = per_action[:, :, 0].argmax(axis=0)
    print("best fixed action per preference:")
    for q, w in enumerate(qoe_weights):
        a = int(best[q])
        rin, rout = ACTION_TO_RATES[a]
        print(f"  {tuple(w)}: action {a} (rin={rin},rout={rout}) "
              f"qoe {per_action[a, q, 0]:+.4f} "
              f"(q {per_action[a, q, 1]:.3f} reb {per_action[a, q, 2]:.3f} "
              f"var {per_action[a, q, 3]:.3f})")
    if args.out_csv:
        with open(args.out_csv, "w", encoding="utf-8") as f:
            f.write("action,qoe_pref_idx,qoe,qoe1,qoe2,qoe3\n")
            for a in range(tables.action_space):
                for q in range(n_prefs):
                    f.write(f"{a},{q}," + ",".join(
                        f"{per_action[a, q, i]:.5f}" for i in range(4)) + "\n")
        print("saved", args.out_csv)


if __name__ == "__main__":
    main()
