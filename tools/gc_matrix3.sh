#!/bin/bash
# Phase 3 of the round-8 Swing large-heap diagnosis: the young-gen-bound
# combos phase 2 lacked. Phase 2 showed -Xms90g ALONE regresses both cold
# (eager 90g commit, zeroed on first touch at runtime) and warm (NewRatio
# sizes eden ~20g+); the bound-young configs are the candidates.
set -u
cd /root/repo
LOG=tools/gc_matrix3.log
: > "$LOG"
run() {
  local label="$1"; shift
  echo "=== $label (loadavg $(cut -d' ' -f1 /proc/loadavg)) ===" >> "$LOG"
  local t0=$SECONDS
  tools/bench_child.sh "$@" >> "$LOG" 2>&1
  echo "wall $((SECONDS - t0))s" >> "$LOG"
}
Q=q_swing
run "90g-xmn2g-1" 90g $Q -Xmn2g
run "90g-xmn2g-2" 90g $Q -Xmn2g
run "90g-xmn2g-3" 90g $Q -Xmn2g
run "90g-zgc-gen-1" 90g $Q -XX:+UseZGC -XX:+ZGenerational
run "8g-control-1" 8g $Q
echo "=== DONE ===" >> "$LOG"
