"""Merge per-preference expert demo cores from two pickles.

Round-5 tooling for per-preference hybrid DAgger demo cores (pairs with
``run_dagger --acc-correct-prefs``): different QoE preferences get their
labels from differently-scored expert runs — e.g. gt-causal-h3 labels on
[7,1,1] (where cloning the gt-scored teacher is proven to realize the
gain) and accuracy-corrected labels on [3,3,3] (where only the corrected
teacher's decisions are a function of causally-observable state).  Both
inputs must come from the same ``--demo-samples``/``--seed`` grid so their
(video, user, trace, qoe) keys line up.

``--strip-obs`` drops observation fields from every demo (e.g.
``action_values`` when the consuming policy has no AV branch: the DAgger
aggregate concatenates demo obs with collector obs, so their field sets
must match).

Usage::

    python benchmarks/merge_demos.py base.pkl other.pkl out.pkl \
        --take-other 3 [--strip-obs action_values]

Preference indices refer to ``config.qoe_split["train"]`` order
(0=[7,1,1], 1=[1,7,1], 2=[1,1,7], 3=[3,3,3]).
"""

import argparse
import pickle

from mansy_immersivevideostreaming_tpu.config import load_config
from mansy_immersivevideostreaming_tpu.data.tianshou_compat import (
    load_demonstrations,
)


def main(argv=None, config=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("base", help="demo pickle providing every pref not listed")
    parser.add_argument("other", help="demo pickle providing --take-other prefs")
    parser.add_argument("output", help="merged pickle to write")
    parser.add_argument("--take-other", type=int, nargs="+", required=True,
                        metavar="PREF_IDX",
                        help="train-preference indices sourced from OTHER")
    parser.add_argument("--strip-obs", type=str, nargs="*", default=None,
                        help="observation fields to drop from every demo")
    parser.add_argument("--config-yml", type=str, default=None)
    args = parser.parse_args(argv)

    if config is None:
        config = load_config(args.config_yml)
    train_prefs = [tuple(int(w) for w in ws) for ws in config.qoe_split["train"]]
    take = set()
    for idx in args.take_other:
        assert 0 <= idx < len(train_prefs), f"bad pref index {idx}"
        take.add(train_prefs[idx])
    print("Prefs from OTHER:", sorted(take))

    base = load_demonstrations(args.base)
    other = load_demonstrations(args.other)
    merged, n_other = {}, 0
    for key, demo in base.items():
        qoe = tuple(int(w) for w in key[3])
        if qoe in take:
            assert key in other, f"OTHER is missing demo {key} (grids differ?)"
            demo = other[key]
            n_other += 1
        merged[key] = demo
    extra = [k for k in other if tuple(int(w) for w in k[3]) in take
             and k not in merged]
    assert not extra, f"OTHER has {len(extra)} demos absent from BASE"
    if args.strip_obs:
        for demo in merged.values():
            for field in args.strip_obs:
                demo["obs"].pop(field, None)
    with open(args.output, "wb") as f:
        pickle.dump(merged, f)
    kept = next(iter(merged.values()))["obs"].keys()
    print(f"Merged {len(merged)} demos ({n_other} from OTHER) -> "
          f"{args.output}; obs fields: {sorted(kept)}")


if __name__ == "__main__":
    main()
