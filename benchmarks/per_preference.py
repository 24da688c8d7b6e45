"""Per-preference means from an episode results.csv.

Usage: python benchmarks/per_preference.py <results.csv>

Groups the reference-schema episode CSV (video,user,trace,w1,w2,w3,qoe,
qoe1,qoe2,qoe3 — written by ``rl/runner.py:append_episode_logs``) by QoE
preference and prints mean qoe / quality / rebuffer / variance per group,
the view used for all conditioning claims in BASELINE.md.
"""

import sys

import numpy as np


def main(path):
    rows = open(path).read().strip().splitlines()
    if rows and rows[0].startswith("video"):
        rows = rows[1:]
    data = {}
    for r in rows:
        f = r.split(",")
        w = tuple(float(x) for x in f[3:6])
        data.setdefault(w, []).append([float(x) for x in f[6:10]])
    print(f"{'pref':>16} {'n':>5} {'qoe':>8} {'quality':>8} "
          f"{'rebuf':>8} {'var':>8}")
    tot = []
    for w, v in sorted(data.items(), reverse=True):
        v = np.asarray(v)
        tot.append(v)
        print(f"{str(tuple(int(x) for x in w)):>16} {len(v):>5} "
              f"{v[:, 0].mean():>8.4f} {v[:, 1].mean():>8.4f} "
              f"{v[:, 2].mean():>8.4f} {v[:, 3].mean():>8.4f}")
    t = np.concatenate(tot)
    print(f"{'ALL':>16} {len(t):>5} {t[:, 0].mean():>8.4f} "
          f"{t[:, 1].mean():>8.4f} {t[:, 2].mean():>8.4f} "
          f"{t[:, 3].mean():>8.4f}")


if __name__ == "__main__":
    main(sys.argv[1])
