#!/bin/bash
# Phase 5 (criterion): three consecutive 90g ZGC runs + 8g control.
# Phase 4's interleaved matrix found single-generation ZGC at 90g runs
# q_swing warm at 8.28 s — inside the 8g ParallelGC band (7.3-9.6 s) —
# while ParallelGC at 90g is 9.6-17.3 s warm / 34-41 s cold.
set -u
cd /root/repo
LOG=tools/gc_matrix5.log
: > "$LOG"
run() {
  local label="$1"; shift
  echo "=== $label (loadavg $(cut -d' ' -f1 /proc/loadavg)) ===" >> "$LOG"
  local t0=$SECONDS
  tools/bench_child.sh "$@" >> "$LOG" 2>&1
  echo "wall $((SECONDS - t0))s" >> "$LOG"
}
Q=q_swing
run "90g-zgc-1" 90g $Q -XX:+UseZGC
run "90g-zgc-2" 90g $Q -XX:+UseZGC
run "90g-zgc-3" 90g $Q -XX:+UseZGC
run "8g-control" 8g $Q
# does ZGC cost anything at the bench's canonical 8g heap?
run "8g-zgc-1" 8g $Q -XX:+UseZGC
echo "=== DONE ===" >> "$LOG"
