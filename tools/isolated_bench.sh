#!/usr/bin/env bash
# Fresh-JVM isolated re-timing: one query per JVM, so shared-JVM noise
# (GC debt, JIT state, page cache churn from *other* queries) cannot
# contaminate a timing. `run / fork := true` makes every runMain fork a
# fresh JVM, and Bench's arg filter runs exactly the named row — so one
# sbt session still pays sbt startup only once.
#
# Usage: tools/isolated_bench.sh <outFile> <query...>
#   SPARK_GRAFT_SF_DIR picks the scale (default /root/testdata/sf0.1).
# Output: one "<query> <seconds>" line per query in <outFile> (parsed
# from each fork's bench JSON line).
set -u
out="${1:?usage: isolated_bench.sh <outFile> <query...>}"; shift
: > "$out"
cmds=""
for q in "$@"; do
  cmds+=";runMain graft.Bench $q"
done
log="$(mktemp /tmp/isolated_bench_XXXX.log)"
sbt "$cmds" > "$log" 2>&1
# every fork prints one JSON line {"metric":"total",...,"queries":{"<q>":t}}
python3 - "$log" "$out" <<'EOF'
import sys, json, re
out = open(sys.argv[2], 'a')
for line in open(sys.argv[1], errors='replace'):
    m = re.search(r'\{"metric":"total".*\}', line)
    if not m:
        continue
    try:
        d = json.loads(m.group(0))
    except Exception:
        continue
    for k, v in d.get("queries", {}).items():
        print(k, v, file=out)
EOF
echo "wrote $(wc -l < "$out") timings to $out (full log: $log)"
