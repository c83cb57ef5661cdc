#!/bin/bash
# Direct bench-child runner: times queries in a fresh JVM WITHOUT the
# sbt lock, so heap/GC experiments can iterate while sbt is busy.
#   tools/bench_child.sh <heap> <query[,query...]> [extra JVM flags...]
# e.g. tools/bench_child.sh 90g q_swing -Xlog:gc:/tmp/gc.log
set -e
HEAP="${1:?heap, e.g. 8g}"; shift
QUERIES="${1:?query names}"; shift
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
OUT="$(mktemp /tmp/bench_child.XXXX.tsv)"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
GC="-XX:+UseParallelGC"
case "$*" in *UseG1GC*|*UseZGC*|*UseParallelGC*|*UseSerialGC*) GC="";; esac
CLASSES="${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}"
java $OPENS -Xmx"$HEAP" $GC "$@" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.Bench --child "$SF_DIR" "$OUT" "$QUERIES" 2>/dev/null
echo "name cold warm"
cat "$OUT"
rm -f "$OUT"
