#!/usr/bin/env python3
"""Round-over-round benchmark diff over the full per-query census.

Usage: python3 tools/bench_diff.py BENCH_FULL_rOLD.json BENCH_FULL_rNEW.json

Reads the one-line bench JSON ({"queries": {name: sec, ...}, ...}) from
each file (BENCH_FULL_r{N}.json committed per round, or
target/bench_full.json from a fresh run) and prints a markdown summary:
totals over the common query set, every regression and improvement past
the significance gate (>25% AND >0.3 s — small absolute deltas on
sub-second queries are JIT/GC noise, not signal), and queries present in
only one round.
"""
import json
import sys


def load(path):
    with open(path, encoding="utf-8") as f:
        d = json.load(f)
    qs = d.get("queries", d)
    # tolerate the driver artifact shape ({"tail": "..."} fragments can't
    # be diffed — require a real queries map)
    if not isinstance(qs, dict) or not qs:
        raise SystemExit(f"{path}: no queries map found")
    return {k: float(v) for k, v in qs.items() if isinstance(v, (int, float))}


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    tot_old = sum(old[q] for q in common)
    tot_new = sum(new[q] for q in common)
    print(f"common queries: {len(common)}  "
          f"total {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({(tot_new - tot_old) / tot_old * 100:+.1f}%)")

    def sig(q):
        d = new[q] - old[q]
        return abs(d) > 0.3 and abs(d) / max(old[q], 1e-9) > 0.25

    regress = sorted((q for q in common if new[q] > old[q] and sig(q)),
                     key=lambda q: old[q] - new[q])
    improve = sorted((q for q in common if new[q] < old[q] and sig(q)),
                     key=lambda q: new[q] - old[q])

    def table(title, names):
        print(f"\n### {title} ({len(names)})\n")
        if not names:
            print("(none)")
            return
        print("| query | old s | new s | delta |")
        print("|---|---|---|---|")
        for q in names:
            print(f"| {q} | {old[q]:.2f} | {new[q]:.2f} | "
                  f"{(new[q] - old[q]) / old[q] * 100:+.0f}% |")

    table("regressions (>25% and >0.3s)", regress)
    table("improvements (>25% and >0.3s)", improve)
    if only_new:
        print(f"\nnew queries this round ({len(only_new)}): "
              + ", ".join(f"{q} ({new[q]:.2f}s)" for q in only_new))
    if only_old:
        print(f"\ndropped queries ({len(only_old)}): " + ", ".join(only_old))


if __name__ == "__main__":
    main()
