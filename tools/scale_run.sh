#!/bin/bash
# Round-9 scale validation: run the heavy-query chunks at sf0.1 and at
# the 10x corpus (tools/scale_corpus.py output), same qt.sh protocol,
# saving per-chunk bench JSONs under /tmp/scale_r9/.
# Usage: tools/scale_run.sh <chunk-name> <q1,q2,...> [tenx-dir]
set -e
NAME="$1"; QS="$2"; TENX="${3:-/tmp/sfx10}"
OUT=/tmp/scale_r9
mkdir -p "$OUT"
ADD=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD="$ADD --add-opens=java.base/$p=ALL-UNNAMED"
done
run() { # sfdir tag
  SPARK_GRAFT_ONLY="$QS" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$1" \
  java -Xms${SPARK_DRIVER_MEM:-48g} -Xmx${SPARK_DRIVER_MEM:-48g} -XX:ReservedCodeCacheSize=1g -XX:+UseParallelGC -XX:-UseAdaptiveSizePolicy -XX:NewRatio=1 $ADD \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench 2>/dev/null >/dev/null
  cp /root/repo/target/bench.json "$OUT/${NAME}_$2.json"
}
run /root/testdata/sf0.1 sf01
run "$TENX" sfx10
echo "[scale_run] $NAME done"
