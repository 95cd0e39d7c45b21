#!/usr/bin/env python3
"""Round-10 census statistics for BENCH_DIFF_r9_r10.md.

Usage: diff_stats.py BENCH_FULL_r9.json run1.json run2.json run3.json
Prints: per-run totals, best-of-3 common-set total vs r9, the
code-untouched cross-round ratio distribution (median/p10/p90), the
within-day per-query dispersion, and every mover past the r8->r9
significance gate (>25% and >0.3 s).
"""
import json
import sys


def load(path):
    line = open(path, encoding="utf-8").read()
    i = line.find('{"metric"')
    d = json.loads(line[i:])
    return {k: float(v) for k, v in d["queries"].items()}


def pct(xs, p):
    xs = sorted(xs)
    return xs[round(p * (len(xs) - 1))]


def main():
    old = load(sys.argv[1])
    runs = [load(p) for p in sys.argv[2:]]
    for i, r in enumerate(runs, 1):
        print(f"run{i}: {len(r)} rows, total {sum(r.values()):.1f}s")
    new = {q: min(r[q] for r in runs) for q in runs[0] if all(q in r for r in runs)}
    common = sorted(set(old) & set(new))
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(f"\ncommon {len(common)} rows: {t_old:.1f}s -> {t_new:.1f}s "
          f"({(t_new - t_old) / t_old * 100:+.1f}%)")
    ratios = [new[q] / old[q] for q in common if old[q] > 0.3]
    print(f"cross-round ratio (base>0.3s, n={len(ratios)}): "
          f"median {pct(ratios, .5):.2f}  p10 {pct(ratios, .1):.2f}  "
          f"p90 {pct(ratios, .9):.2f}")
    if len(runs) >= 2:
        disp = []
        for q in runs[0]:
            if all(q in r for r in runs) and min(r[q] for r in runs) > 0.3:
                vals = [r[q] for r in runs]
                disp.append((max(vals) - min(vals)) / min(vals))
        print(f"within-day spread over 3 runs (base>0.3s, n={len(disp)}): "
              f"median {pct(disp, .5) * 100:.1f}%  p90 {pct(disp, .9) * 100:.1f}%")
    med = pct(ratios, .5)
    movers = [(q, old[q], new[q]) for q in common
              if abs(new[q] - old[q]) > 0.3
              and abs(new[q] - old[q]) / old[q] > 0.25]
    movers.sort(key=lambda t: t[2] / t[1], reverse=True)
    print(f"\nmovers past the gate (>25% and >0.3s): {len(movers)}")
    for q, o, n in movers:
        print(f"  {q:32s} {o:6.2f} -> {n:6.2f}  ratio {n / o:.2f}  "
              f"box-norm {n / o / med:.2f}")
    only_new = sorted(set(new) - set(old))
    print(f"\nnew rows: {only_new}")
    for q in only_new:
        print(f"  {q:32s} {new[q]:6.2f}")


if __name__ == "__main__":
    main()
