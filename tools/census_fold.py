#!/usr/bin/env python3
"""Fold N bench-JSON runs into one best-of-N census map.

Seconds rows (lower is better) fold with MIN; rows whose name matches a
HIGHER_IS_BETTER prefix (currently vector_seq_qps*) fold with MAX — a
best-of-N census must keep the BEST run of a higher-is-better metric,
not the worst. Rows present in only some runs keep their folded value
over the runs that have them.

Usage:
  python3 tools/census_fold.py run1.json run2.json run3.json > BENCH_FULL_rN.json

Each input is a bench artifact: either the one-line Bench JSON
({"metric":"total","queries":{...},...}) or a bare {"queries": {...}} /
{name: sec} map. Output is one JSON line in the Bench shape with the
folded queries map, value = sum of folded seconds rows, and a
"fold_max" list recording which rows folded with max.
"""
import json
import sys

HIGHER_IS_BETTER = ("vector_seq_qps",)


def load(path):
    with open(path, encoding="utf-8") as f:
        txt = f.read()
    # tolerate log files holding the JSON line among other output
    for line in txt.splitlines():
        line = line.strip()
        i = line.find('{"metric"')
        if i >= 0:
            d = json.loads(line[i:])
            return {k: float(v) for k, v in d.get("queries", {}).items()}
    d = json.loads(txt)
    qs = d.get("queries", d)
    return {k: float(v) for k, v in qs.items()
            if isinstance(v, (int, float))}


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    runs = [load(p) for p in sys.argv[1:]]
    names = []
    for r in runs:
        for k in r:
            if k not in names:
                names.append(k)
    folded, fold_max = {}, []
    for name in names:
        vals = [r[name] for r in runs if name in r]
        if any(name.startswith(p) for p in HIGHER_IS_BETTER):
            folded[name] = max(vals)
            fold_max.append(name)
        else:
            folded[name] = min(vals)
    total = sum(v for k, v in folded.items() if k not in fold_max)
    print(json.dumps({"metric": "total", "value": round(total, 4),
                      "unit": "sec", "queries": folded,
                      "fold_max": fold_max, "runs": len(runs)}))


if __name__ == "__main__":
    main()
