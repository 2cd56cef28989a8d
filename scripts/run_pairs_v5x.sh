#!/bin/bash
# v5x: idle-host single-pair sweep of the four phases whose per-phase
# records are weakest (node2vec_chained 0.618, stateful_chained 0.592,
# node2vec_reject 0.601-0.619, metapath_chained 0.685-0.717) at the
# composite widths local[2] -> local[8], 1.5M corpus, round-5 pins.
# Rationale: the v5u r6 idle-host composite showed the clean bands sit
# well above every contended sample (pagerank 0.909 cpu-dead-flat,
# deepwalk 1.004); these four phases' records were all taken during the
# contended window and deserve one clean-host sample each.
# Run UNCONTENDED; do not recompile target/classes while this runs.
set -x
cd /root/repo
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false -Xmx32g"
export SPARK_GRAFT_PHASES="node2vec_chained,stateful_chained,node2vec_reject,metapath_chained"

mkdir -p target/campaigns
for i in "${IDX:-1}"; do
  java $OPENS $JOPTS -cp "$CP" graft.Scaling 1500000 2 "BENCH/PAIR_v5x_1500k_r${i}.md" \
    > "target/campaigns/v5x_1500k_r${i}.log" 2>&1
  echo "v5x r${i} rc=$?" >> target/campaigns/status
  cp /tmp/graft-scaling-2.tsv "BENCH/PAIR_v5x_1500k_r${i}_N.tsv"  2>/dev/null
  cp /tmp/graft-scaling-8.tsv "BENCH/PAIR_v5x_1500k_r${i}_4N.tsv" 2>/dev/null
done
echo "v5x repeats complete" >> target/campaigns/status
