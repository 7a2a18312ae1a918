#!/usr/bin/env bash
# Restricted-run A/B bench protocol (bench/NOTES.md; round-7 item 7).
#
# This box has a ±40% co-tenant band, so a single full-bench reading cannot
# distinguish a regression from ambient load. The contention-proof protocol:
# run ONLY the queries under suspicion, baseline-vs-candidate back-to-back
# on the same box within minutes, and read the ratio table (plus the CPU
# column, which is ambient-robust — see graft.Bench's BenchListener).
#
# Usage:
#   tools/bench_compare.sh <baseline-ref> q_a[,q_b,...] [sfDir]
#
#   baseline-ref  a git commit/branch to measure as baseline (checked out
#                 into a temp worktree — the working tree is NOT touched)
#   queries       comma-separated GRAFT_BENCH_ONLY set
#   sfDir         testdata dir (default /root/testdata/sf0.1)
#
# Example:
#   tools/bench_compare.sh HEAD~1 q_color_greedy,q_kcore
#
# Prints per-query wall/cpu for baseline and candidate and the ratios.
# Candidate = the current working tree (uncommitted changes included).
set -euo pipefail

REF="${1:?usage: bench_compare.sh <baseline-ref> <q_a,q_b,...> [sfDir]}"
QUERIES="${2:?usage: bench_compare.sh <baseline-ref> <q_a,q_b,...> [sfDir]}"
SFDIR="${3:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-32}"
REPO="$(git rev-parse --show-toplevel)"
SFNAME="$(basename "$SFDIR")"

run_bench() { # $1=dir $2=out.json
  (cd "$1" && GRAFT_BENCH_ONLY="$QUERIES" GRAFT_BENCH_OUT="$2" \
    SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="$CPUS" \
    sbt -batch "runMain graft.Bench" >/dev/null 2>&1)
}

WT="$(mktemp -d /tmp/bench_baseline.XXXXXX)"
cleanup() { git -C "$REPO" worktree remove --force "$WT" 2>/dev/null || true; }
trap cleanup EXIT
git -C "$REPO" worktree add --detach "$WT" "$REF" >/dev/null 2>&1

BASE_JSON="/tmp/bench_ab_base_$SFNAME.json"
CAND_JSON="/tmp/bench_ab_cand_$SFNAME.json"
echo "== baseline ($REF) building+running: $QUERIES @ $SFNAME =="
run_bench "$WT" "$BASE_JSON"
echo "== candidate (working tree) running =="
run_bench "$REPO" "$CAND_JSON"

python3 - "$BASE_JSON" "$CAND_JSON" <<'EOF'
import json, sys
base = json.load(open(sys.argv[1]))["queries"]
cand = json.load(open(sys.argv[2]))["queries"]
def cell(m, k, f):   # pre-r7 baselines may be bare wall numbers
    v = m.get(k); return (v.get(f) if isinstance(v, dict) else (v if f == "wall" else None))
hdr = f"{'query':<24} {'base wall':>9} {'cand wall':>9} {'ratio':>6}   {'base cpu':>8} {'cand cpu':>8} {'ratio':>6}"
print(hdr); print("-" * len(hdr))
for k in sorted(set(base) | set(cand)):
    bw, cw = cell(base, k, "wall"), cell(cand, k, "wall")
    bc, cc = cell(base, k, "cpu"), cell(cand, k, "cpu")
    def r(a, b): return f"{b/a:6.2f}" if a and b else "   n/a"
    def s(x): return f"{x:9.2f}" if x is not None else "      n/a"
    def s8(x): return f"{x:8.2f}" if x is not None else "     n/a"
    print(f"{k:<24} {s(bw)} {s(cw)} {r(bw, cw)}   {s8(bc)} {s8(cc)} {r(bc, cc)}")
print("\nwall ratio > 1 with flat cpu ratio = ambient load, not regression.")
EOF
