#!/bin/bash
# Phase 4 (final): clean interleaved comparison on an idle box. Phases
# 1-3 established: (a) judge's 90g numbers reproduce under lazy commit;
# (b) -Xms90g / AlwaysPreTouch / their combos REGRESS (full commit
# evicts the page cache on a 125 GiB box and inflates the young gen);
# (c) -Xmn2g under lazy commit is the only config that beat adaptive —
# but early phase-3 runs were polluted by cache eviction from killed
# full-commit runs. This phase interleaves the three surviving configs
# x3 so every config sees the same cache state. ZGenerational is not in
# JDK 17 (instant exit); plain ZGC x1 for the record.
set -u
cd /root/repo
LOG=tools/gc_matrix4.log
: > "$LOG"
run() {
  local label="$1"; shift
  echo "=== $label (loadavg $(cut -d' ' -f1 /proc/loadavg)) ===" >> "$LOG"
  local t0=$SECONDS
  tools/bench_child.sh "$@" >> "$LOG" 2>&1
  echo "wall $((SECONDS - t0))s" >> "$LOG"
}
Q=q_swing
for i in 1 2 3; do
  run "8g-plain-$i" 8g $Q
  run "90g-plain-$i" 90g $Q
  run "90g-xmn2g-$i" 90g $Q -Xmn2g
done
run "90g-zgc-1" 90g $Q -XX:+UseZGC
echo "=== DONE ===" >> "$LOG"
