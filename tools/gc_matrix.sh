#!/bin/bash
# Round-8 diagnosis matrix for the Swing large-heap pathology (VERDICT r7 #1).
# Judge-measured (idle box): 8g warm 8.1 s; 90g warm 13.7/16.6/29.3 s,
# cold 59-89 s. Hypotheses: (a) lazy heap commit/zeroing during the cold
# run -> AlwaysPreTouch; (b) ParallelGC adaptive young-gen churn at 90g
# -> fixed -Xmn; (c) generational ZGC as the large-heap collector.
# Runs bench_child.sh over the grid, logging to tools/gc_matrix.log.
set -u
cd /root/repo
LOG=tools/gc_matrix.log
: > "$LOG"
# Pre-warm the OS page cache so "cold" means cold JVM, not cold disk.
cat /root/testdata/sf0.1/*.parquet > /dev/null 2>&1 || true
run() {
  local label="$1"; shift
  echo "=== $label (loadavg $(cut -d' ' -f1 /proc/loadavg)) ===" >> "$LOG"
  local t0=$SECONDS
  tools/bench_child.sh "$@" >> "$LOG" 2>&1
  echo "wall $((SECONDS - t0))s" >> "$LOG"
}
Q=q_swing
# 8g reference point x3
run "8g-base-1" 8g $Q
run "8g-base-2" 8g $Q
run "8g-base-3" 8g $Q
# reproduce the judge: plain 90g x3
run "90g-plain-1" 90g $Q
run "90g-plain-2" 90g $Q
run "90g-plain-3" 90g $Q
# one diagnostic run with GC logging (kept out of the timing comparison)
run "90g-gclog" 90g $Q -Xlog:gc:tools/gc90_plain.log
# hypotheses, x3 each for the "three consecutive within 1.5x" criterion
run "90g-pretouch-1" 90g $Q -XX:+AlwaysPreTouch
run "90g-pretouch-2" 90g $Q -XX:+AlwaysPreTouch
run "90g-pretouch-3" 90g $Q -XX:+AlwaysPreTouch
run "90g-xmn2g-1" 90g $Q -Xmn2g
run "90g-pretouch-xmn2g-1" 90g $Q -XX:+AlwaysPreTouch -Xmn2g
run "90g-pretouch-xmn2g-2" 90g $Q -XX:+AlwaysPreTouch -Xmn2g
run "90g-pretouch-xmn2g-3" 90g $Q -XX:+AlwaysPreTouch -Xmn2g
run "90g-zgc-gen-1" 90g $Q -XX:+UseZGC -XX:+ZGenerational
echo "=== DONE ===" >> "$LOG"
