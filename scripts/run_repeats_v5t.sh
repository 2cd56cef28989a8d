#!/bin/bash
# v5t: first N->4N evidence for the metapath chained engine (r4 VERDICT
# "what's missing" #4 named metapath or the stateful engine; stateful
# landed in v4 — this closes metapath). Single-phase filtered pairs at
# the v3c widths local[2] -> local[8], 1.5M corpus: the typed-CSR build
# and scheme-masked walk land in the phase's own delta (self-contained
# attribution, like v5s's node2vec_reject unit — NOT comparable to the
# v5r two-phase unit, where the shared CSR lands in deepwalk's delta).
set -x
cd /root/repo
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false -Xmx32g"
export SPARK_GRAFT_PHASES="metapath_chained"

mkdir -p target/campaigns
for i in 4; do
  java $OPENS $JOPTS -cp "$CP" graft.Scaling 1500000 2 "BENCH/PAIR_v5t_1500k_r${i}.md" \
    > "target/campaigns/v5t_1500k_r${i}.log" 2>&1
  echo "v5t r${i} rc=$?" >> target/campaigns/status
  cp /tmp/graft-scaling-2.tsv "BENCH/PAIR_v5t_1500k_r${i}_N.tsv"  2>/dev/null
  cp /tmp/graft-scaling-8.tsv "BENCH/PAIR_v5t_1500k_r${i}_4N.tsv" 2>/dev/null
done
echo "v5t repeats complete" >> target/campaigns/status
