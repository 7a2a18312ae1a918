#!/bin/bash
# r13: heavy-tier 100x oracle replays, attempt 2 — RAM-first (85GB DuckDB
# memory limit cuts the spill that filled the disk at 40GB), cheapest
# oracle first so PASSes bank early; per-oracle disk watchdog via budget.
set -u
cd /root/repo
LOG=/root/repo/bench/r13/heavy_replay2.log
: > "$LOG"
for q in q_dedup_minhash q_dedup_simhash q_dedup_semantic q_dedup_canonical; do
  rm -rf /tmp/duck_spill/* 2>/dev/null
  echo "=== $q start $(date -u +%H:%M:%S) free=$(df -h / | awk 'NR==2{print $4}') ===" >> "$LOG"
  GRAFT_DUCK_MEM=85GB timeout 7500 python3 tools/check_oracle.py /tmp/graft-sf10 /tmp/verify_sf10 \
    --only "$q" --budget 7200 >> "$LOG" 2>&1
  echo "=== $q exit=$? $(date -u +%H:%M:%S) free=$(df -h / | awk 'NR==2{print $4}') ===" >> "$LOG"
done
rm -rf /tmp/duck_spill/* 2>/dev/null
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
