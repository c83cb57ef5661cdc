#!/bin/bash
# Round-8 diagnosis matrix for the Swing large-heap pathology (VERDICT r7 #1).
# Runs bench_child.sh over a heap x JVM-flag grid, logging to tools/gc_matrix.log.
set -u
cd /root/repo
LOG=tools/gc_matrix.log
: > "$LOG"
run() {
  local label="$1"; shift
  echo "=== $label (loadavg $(cut -d' ' -f1 /proc/loadavg)) ===" >> "$LOG"
  tools/bench_child.sh "$@" >> "$LOG" 2>&1
}
Q=q_swing
# 8g reference point x2
run "8g-base-1" 8g $Q
run "8g-base-2" 8g $Q
# reproduce the judge: plain 90g x3
run "90g-plain-1" 90g $Q
run "90g-plain-2" 90g $Q
run "90g-plain-3" 90g $Q
# hypotheses
run "90g-pretouch" 90g $Q -XX:+AlwaysPreTouch
run "90g-xmn2g" 90g $Q -Xmn2g
run "90g-pretouch-xmn2g" 90g $Q -XX:+AlwaysPreTouch -Xmn2g
run "90g-zgc-gen" 90g $Q -XX:+UseZGC -XX:+ZGenerational
echo "=== DONE ===" >> "$LOG"
