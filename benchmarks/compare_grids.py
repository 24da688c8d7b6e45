"""Side-by-side per-preference comparison of episode results grids.

Usage: python benchmarks/compare_grids.py name1=path1.csv name2=path2.csv ...

Prints mean qoe per preference for each grid plus the deltas vs the FIRST
grid (the baseline/oracle column) — the view for "percent of oracle per
preference" claims (VERDICT r2 items 1/7).
"""

import sys

import numpy as np


def load(path):
    rows = open(path).read().strip().splitlines()
    if rows and rows[0].startswith("video"):
        rows = rows[1:]
    data = {}
    for r in rows:
        f = r.split(",")
        w = tuple(float(x) for x in f[3:6])
        data.setdefault(w, []).append([float(x) for x in f[6:10]])
    return {w: np.asarray(v) for w, v in data.items()}


def main(args):
    grids = []
    for a in args:
        name, path = a.split("=", 1)
        grids.append((name, load(path)))
    prefs = sorted({w for _, g in grids for w in g}, reverse=True)
    header = f"{'pref':>16}" + "".join(f" {n:>12}" for n, _ in grids)
    if len(grids) > 1:
        header += "".join(f" {'d:' + n:>12}" for n, _ in grids[1:])
    print(header)
    for w in prefs:
        vals = [g[w][:, 0].mean() if w in g else float("nan")
                for _, g in grids]
        line = f"{str(tuple(int(x) if x == int(x) else x for x in w)):>16}"
        line += "".join(f" {v:>12.4f}" for v in vals)
        line += "".join(f" {v - vals[0]:>+12.4f}" for v in vals[1:])
        print(line)
    tots = [np.concatenate(list(g.values()))[:, 0].mean() for _, g in grids]
    line = f"{'ALL':>16}" + "".join(f" {v:>12.4f}" for v in tots)
    line += "".join(f" {v - tots[0]:>+12.4f}" for v in tots[1:])
    print(line)


if __name__ == "__main__":
    main(sys.argv[1:])
