#!/usr/bin/env bash
# Fresh-JVM isolated re-timing: one query per JVM, so shared-JVM noise
# (GC debt, JIT state, page cache churn from *other* queries) cannot
# contaminate a timing. `run / fork := true` makes every runMain fork a
# fresh JVM, and Bench's arg filter runs exactly the named row — so one
# sbt session still pays sbt startup only once.
#
# Usage: tools/isolated_bench.sh [--against <sha>] [--reps N] <outFile> <query...>
#   SPARK_GRAFT_SF_DIR picks the scale (default /root/testdata/sf0.1).
#
# Plain mode: one "<query> <seconds>" line per query per rep in
# <outFile>, parsed from each fork's bench JSON line and FILTERED to
# the requested row (naming a section row like maintained_search_serve
# runs its whole section in that fork, but only the named row is
# reported). Exits non-zero if sbt fails or any requested timing is
# missing.
#
# A/B mode (--against <sha>): the standing cross-round mover
# adjudication instrument (BENCH_DIFF_r9_r10 / tools/ab_r10
# methodology, one command): checks out <sha> into a reusable detached
# worktree under /tmp, then INTERLEAVES repetitions — HEAD rep, <sha>
# rep, HEAD rep, … — so box drift inside the session hits both trees
# equally. HEAD timings land in <outFile>, <sha> timings in
# <outFile>.against, and a per-query median ratio table prints at the
# end. Rows the old tree's Bench does not know are warned and skipped
# there (new rows have no old twin). Caveat: <sha> must already carry
# Bench's arg filtering (true since round 8); for older SHAs
# cherry-pick the harness hunks by hand (tools/ab_r10/ANALYSIS.md).
set -u
against=""
reps=1
while [ "${1:-}" = "--against" ] || [ "${1:-}" = "--reps" ]; do
  case "$1" in
    --against) against="$2"; shift 2;;
    --reps) reps="$2"; shift 2;;
  esac
done
out="${1:?usage: isolated_bench.sh [--against <sha>] [--reps N] <outFile> <query...>}"; shift
[ "$#" -ge 1 ] || { echo "isolated_bench.sh: no queries named" >&2; exit 2; }
: > "$out"

cmds=""
for q in "$@"; do
  cmds+=";runMain graft.Bench $q"
done

# $1 = tree dir, $2 = out file, $3 = allow-missing (0/1). Appends one
# repetition of every requested query timed in $1.
run_tree() {
  local dir="$1" outfile="$2" allow="$3"
  shift 3
  local log
  log="$(mktemp /tmp/isolated_bench_XXXX.log)"
  if ! (cd "$dir" && sbt "$cmds" > "$log" 2>&1); then
    echo "isolated_bench.sh: sbt failed in $dir (log: $log)" >&2
    return 1
  fi
  # every fork prints one JSON line {"metric":"total",...,"queries":{...}};
  # fork i answers request i — pair them positionally, keep only the
  # requested row from each fork's (possibly section-wide) map
  ALLOW_MISSING="$allow" python3 - "$log" "$outfile" "$@" <<'EOF'
import os, sys, json, re
log, outPath, want = sys.argv[1], sys.argv[2], sys.argv[3:]
allow = os.environ.get("ALLOW_MISSING") == "1"
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
    msg = (f"isolated_bench.sh: rows missing from their fork's output: "
           f"{missing} (log: {log})")
    if allow:
        print(msg + " — skipped (old tree)", file=sys.stderr)
    else:
        print(msg, file=sys.stderr)
        sys.exit(1)
EOF
  local rc=$?
  [ "$rc" -eq 0 ] || return "$rc"
  return 0
}

wt=""
if [ -n "$against" ]; then
  sha="$(git rev-parse --short "$against")" || exit 1
  wt="/tmp/graft_ab_$sha"
  if [ ! -d "$wt" ]; then
    git worktree add --detach "$wt" "$against" >&2 || exit 1
  fi
  : > "$out.against"
fi

rep=1
while [ "$rep" -le "$reps" ]; do
  echo "[isolated_bench] rep $rep/$reps: HEAD" >&2
  run_tree "." "$out" 0 "$@" || exit 1
  if [ -n "$wt" ]; then
    echo "[isolated_bench] rep $rep/$reps: $against ($wt)" >&2
    SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
      run_tree "$wt" "$out.against" 1 "$@" || exit 1
  fi
  rep=$((rep + 1))
done

echo "wrote $(wc -l < "$out") timings to $out"
if [ -n "$wt" ]; then
  echo "wrote $(wc -l < "$out.against") timings to $out.against (worktree kept at $wt)"
  python3 - "$out" "$out.against" <<'EOF'
import sys, statistics as st
def load(p):
    d = {}
    for line in open(p):
        parts = line.split()
        if len(parts) == 2:
            d.setdefault(parts[0], []).append(float(parts[1]))
    return d
head, old = load(sys.argv[1]), load(sys.argv[2])
print(f"{'query':40s} {'HEAD med':>10s} {'old med':>10s} {'ratio':>7s}  (reps)")
for q in head:
    if q not in old:
        print(f"{q:40s} {st.median(head[q]):10.3f} {'—':>10s} {'—':>7s}  (old tree lacks row)")
        continue
    h, o = st.median(head[q]), st.median(old[q])
    print(f"{q:40s} {h:10.3f} {o:10.3f} {h/o if o else float('inf'):7.2f}  ({len(head[q])}v{len(old[q])})")
EOF
fi
