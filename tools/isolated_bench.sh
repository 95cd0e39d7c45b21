#!/usr/bin/env bash
# Fresh-JVM isolated re-timing: one query per JVM, so shared-JVM noise
# (GC debt, JIT state, page cache churn from *other* queries) cannot
# contaminate a timing. `run / fork := true` makes every runMain fork a
# fresh JVM, and Bench's arg filter runs exactly the named row — so one
# sbt session still pays sbt startup only once.
#
# Usage: tools/isolated_bench.sh <outFile> <query...>
#   SPARK_GRAFT_SF_DIR picks the scale (default /root/testdata/sf0.1).
# Output: one "<query> <seconds>" line per query in <outFile>, parsed
# from each fork's bench JSON line and FILTERED to the requested row
# (naming a section row like maintained_search_serve runs its whole
# section in that fork, but only the named row is reported). Exits
# non-zero if sbt fails or any requested timing is missing.
set -u
out="${1:?usage: isolated_bench.sh <outFile> <query...>}"; shift
[ "$#" -ge 1 ] || { echo "isolated_bench.sh: no queries named" >&2; exit 2; }
: > "$out"
cmds=""
for q in "$@"; do
  cmds+=";runMain graft.Bench $q"
done
log="$(mktemp /tmp/isolated_bench_XXXX.log)"
if ! sbt "$cmds" > "$log" 2>&1; then
  echo "isolated_bench.sh: sbt failed (log: $log)" >&2
  exit 1
fi
# every fork prints one JSON line {"metric":"total",...,"queries":{...}};
# fork i answers request i — pair them positionally, keep only the
# requested row from each fork's (possibly section-wide) map
python3 - "$log" "$out" "$@" <<'EOF'
import sys, json, re
log, outPath, want = sys.argv[1], sys.argv[2], sys.argv[3:]
maps = []
for line in open(log, errors='replace'):
    m = re.search(r'\{"metric":"total".*\}', line)
    if not m:
        continue
    try:
        maps.append(json.loads(m.group(0)).get("queries", {}))
    except Exception:
        continue
if len(maps) != len(want):
    print(f"isolated_bench.sh: {len(want)} forks requested but "
          f"{len(maps)} bench JSON lines parsed (log: {log})",
          file=sys.stderr)
    sys.exit(1)
missing = []
with open(outPath, 'a') as out:
    for name, qs in zip(want, maps):
        if name in qs:
            print(name, qs[name], file=out)
        else:
            missing.append(name)
if missing:
    print(f"isolated_bench.sh: rows missing from their fork's output: "
          f"{missing} (log: {log})", file=sys.stderr)
    sys.exit(1)
EOF
rc=$?
[ "$rc" -eq 0 ] || exit "$rc"
echo "wrote $(wc -l < "$out") timings to $out (full log: $log)"
