#!/bin/bash
# Phase 2 of the round-8 Swing large-heap diagnosis. Phase 1's GC log
# (tools/gc90_plain.log) shows the cold pathology: with no -Xms,
# ParallelGC commits the 90g heap lazily and page commit+zeroing lands
# INSIDE GC pauses on the allocation path (a 27.1 s young pause at
# GC(15)). Phase 2 tests -Xms (eager commit) with and without
# AlwaysPreTouch (zeroing at startup instead of first GC touch) and a
# fixed young gen (kills adaptive young-size churn on the warm runs).
set -u
cd /root/repo
LOG=tools/gc_matrix2.log
: > "$LOG"
run() {
  local label="$1"; shift
  echo "=== $label (loadavg $(cut -d' ' -f1 /proc/loadavg)) ===" >> "$LOG"
  local t0=$SECONDS
  tools/bench_child.sh "$@" >> "$LOG" 2>&1
  echo "wall $((SECONDS - t0))s" >> "$LOG"
}
Q=q_swing
run "90g-xms-1" 90g $Q -Xms90g
run "90g-xms-2" 90g $Q -Xms90g
run "90g-xms-3" 90g $Q -Xms90g
run "90g-xms-pretouch-1" 90g $Q -Xms90g -XX:+AlwaysPreTouch
run "90g-xms-pretouch-2" 90g $Q -Xms90g -XX:+AlwaysPreTouch
run "90g-xms-pretouch-3" 90g $Q -Xms90g -XX:+AlwaysPreTouch
run "90g-xms-xmn2g-1" 90g $Q -Xms90g -Xmn2g
run "90g-xms-xmn2g-2" 90g $Q -Xms90g -Xmn2g
run "90g-xms-xmn2g-3" 90g $Q -Xms90g -Xmn2g
# control: does -Xms change the 8g numbers at all?
run "8g-xms-1" 8g $Q -Xms8g
echo "=== DONE ===" >> "$LOG"
