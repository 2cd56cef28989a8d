#!/bin/bash
# v5p extension: two more repeat pairs (r5, r6) of the north-rule phases
# at 3M convs / 64.3M edges, identical protocol/envelope to
# run_repeats_v5p.sh — grows the cpu-flat sample pool behind the
# medians table (compose_v5p_medians.py reads every r{i} it finds).
set -x
cd /root/repo
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false -Xmx32g"
export SPARK_GRAFT_PHASES="derive_edges,pagerank_10it,cc_conv"

for i in 5 6; do
  java $OPENS $JOPTS -cp "$CP" graft.Scaling 3000000 8 "BENCH/PAIR_v5p_3M_r${i}.md" \
    > "target/campaigns/v5p_3M_r${i}.log" 2>&1
  echo "v5p r${i} rc=$?" >> target/campaigns/status
  cp /tmp/graft-scaling-8.tsv  "BENCH/PAIR_v5p_3M_r${i}_N.tsv"  2>/dev/null
  cp /tmp/graft-scaling-32.tsv "BENCH/PAIR_v5p_3M_r${i}_4N.tsv" 2>/dev/null
done
echo "v5p extra repeats complete" >> target/campaigns/status
