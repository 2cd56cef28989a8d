#!/bin/bash
# v5w: deepwalk_chained-only repeat pairs at the composite widths
# (1.5M, 2->8, r5 pins). deepwalk is the one phase without a cpu-flat
# sample in the v5u composite campaign (it caught the stall window in
# all five pairs, so the closing union composite carries it at a
# stalled +46 % sample). A single-phase pair costs ~10-15 min, so
# repeats here are the cheap way to hunt one admissible sample.
# Run UNCONTENDED; do not recompile target/classes while this runs.
set -x
cd /root/repo
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false -Xmx32g"
export SPARK_GRAFT_PHASES="deepwalk_chained"

mkdir -p target/campaigns
for i in $(seq "${FIRST:-1}" "${LAST:-3}"); do
  java $OPENS $JOPTS -cp "$CP" graft.Scaling 1500000 2 "BENCH/PAIR_v5w_1500k_r${i}.md" \
    > "target/campaigns/v5w_1500k_r${i}.log" 2>&1
  echo "v5w r${i} rc=$?" >> target/campaigns/status
  cp /tmp/graft-scaling-2.tsv "BENCH/PAIR_v5w_1500k_r${i}_N.tsv"  2>/dev/null
  cp /tmp/graft-scaling-8.tsv "BENCH/PAIR_v5w_1500k_r${i}_4N.tsv" 2>/dev/null
done
echo "v5w repeats complete" >> target/campaigns/status
