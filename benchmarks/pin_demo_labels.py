"""Pin per-preference expert demo labels to fixed actions.

Round-4 tooling for building hybrid DAgger demo cores (previously done with
ad-hoc scripts in /root/runs, lost to the between-rounds wipe — this commits
the step).  Loads a demonstrations pickle (native `cli/run_expert.py` format
or the reference's tianshou ReplayBuffer pickles,
`/root/reference/bitrate_selection/run_expert.py:75-81`), overwrites every
action of the selected train preferences with a constant, and writes a new
pickle in the native format.

Rationale (BASELINE.md round-4 sections): some preferences' optimum IS a
constant action ([1,7,1] -> action 10 = const-min), and MPC labels for them
only inject label noise into the aggregate; pinning the demo core keeps the
teacher consistent with `run_dagger --pin-expert` relabels.

Usage::

    python benchmarks/pin_demo_labels.py in.pkl out.pkl --pin 1:10 [0:14 ...]

Pin indices refer to `config.qoe_split["train"]` order
(0=[7,1,1], 1=[1,7,1], 2=[1,1,7], 3=[3,3,3]).
"""

import argparse
import pickle

import numpy as np

from mansy_immersivevideostreaming_tpu.config import load_config
from mansy_immersivevideostreaming_tpu.data.tianshou_compat import (
    load_demonstrations,
)


def main(argv=None, config=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input", help="demonstrations pickle to read")
    parser.add_argument("output", help="pinned demonstrations pickle to write")
    parser.add_argument("--pin", type=str, nargs="+", required=True,
                        metavar="PREF_IDX:ACTION",
                        help="train-preference index -> fixed action")
    parser.add_argument("--config-yml", type=str, default=None)
    args = parser.parse_args(argv)

    if config is None:
        config = load_config(args.config_yml)
    train_prefs = [tuple(int(w) for w in ws) for ws in config.qoe_split["train"]]
    pins = {}
    for spec in args.pin:
        idx, act = (int(x) for x in spec.split(":"))
        assert 0 <= idx < len(train_prefs), f"bad pref index {idx}"
        assert 0 <= act < config.action_space, f"bad action {act}"
        pins[train_prefs[idx]] = act
    print("Pins (qoe tuple -> action):", pins)

    demos = load_demonstrations(args.input)
    n_pinned = n_acts = 0
    for key, demo in demos.items():
        qoe = tuple(int(w) for w in key[3])
        if qoe in pins:
            demo["act"] = np.full_like(np.asarray(demo["act"]), pins[qoe])
            n_pinned += 1
            n_acts += demo["act"].shape[0]
    with open(args.output, "wb") as f:
        pickle.dump(demos, f)
    print(f"Pinned {n_pinned}/{len(demos)} demos ({n_acts} transitions) "
          f"-> {args.output}")


if __name__ == "__main__":
    main()
