#!/usr/bin/env python3
"""Dev-only: compare N bench_detail JSONs (like-for-like totals, per-query
spread, outliers vs the committed previous round). Usage:
  python3 dev/bench_compare.py runA.json runB.json [...] [--prev prev.json]
Prints total per run over the SHARED name set, the max/min ratio per
query across runs, and any query >2x its best reading — the r12 task-3
done-criteria (three consecutive idle totals within ±10 %, no
unchanged-plan query outside 2x across runs).
"""
import json
import sys


def load(p):
    d = json.load(open(p))
    q = d.get("queries") or d
    return {k: v for k, v in q.items() if isinstance(v, (int, float)) and v >= 0}


def main(argv):
    prev = None
    if "--prev" in argv:
        i = argv.index("--prev")
        prev = load(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    runs = [load(p) for p in argv]
    shared = set(runs[0])
    for r in runs[1:]:
        shared &= set(r)
    if prev:
        shared_prev = shared & set(prev)
    totals = [sum(r[k] for k in shared) / 100.0 for r in runs]
    print(f"shared names: {len(shared)}")
    for p, t in zip(argv, totals):
        print(f"  {p}: {t:.1f} s")
    band = (max(totals) / min(totals) - 1) * 100
    print(f"total band (max/min-1): {band:.1f}%  "
          f"{'PASS' if band <= 10 else 'FAIL'} (<=10%)")
    bad = []
    for k in shared:
        vals = [r[k] for r in runs]
        if min(vals) >= 25 and max(vals) > 2 * min(vals):  # >=0.25s floor
            bad.append((k, [v / 100.0 for v in vals]))
    bad.sort(key=lambda t: -max(t[1]))
    print(f"queries >2x across runs (>=0.25s floor): {len(bad)}  "
          f"{'PASS' if not bad else 'FAIL'}")
    for k, vals in bad[:15]:
        print(f"  {k}: {vals}")
    if prev:
        tprev = sum(prev[k] for k in shared_prev) / 100.0
        tnow = sum(runs[-1][k] for k in shared_prev) / 100.0
        print(f"like-for-like vs prev ({len(shared_prev)} names): "
              f"{tnow:.1f} s vs {tprev:.1f} s = {tnow / tprev:.2f}x")
        worst = sorted(((runs[-1][k] / prev[k], k) for k in shared_prev
                        if prev[k] >= 25 and runs[-1][k] >= 0),
                       reverse=True)[:10]
        print("  worst vs prev (>=0.25s prev floor):")
        for ratio, k in worst:
            print(f"    {k}: {ratio:.2f}x ({prev[k]/100:.2f} -> "
                  f"{runs[-1][k]/100:.2f} s)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
