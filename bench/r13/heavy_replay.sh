#!/bin/bash
# r13 item 2: clear the DEFERred heavy-tier 100x oracle replays one-by-one.
set -u
cd /root/repo
LOG=/root/repo/bench/r13/heavy_replay.log
: > "$LOG"
for q in q_dedup_canonical q_dedup_simhash q_dedup_minhash q_dedup_semantic; do
  echo "=== $q start $(date -u +%H:%M:%S) ===" >> "$LOG"
  GRAFT_DUCK_MEM=40GB timeout 7500 python3 tools/check_oracle.py /tmp/graft-sf10 /tmp/verify_sf10 \
    --only "$q" --budget 7200 >> "$LOG" 2>&1
  echo "=== $q exit=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
done
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
