#!/bin/bash
# v5y: idle-host single pair for the two phases whose v5x r2 samples
# caught the stall window (node2vec_chained cpu 627->1008 +61 %,
# node2vec_reject 248->401 +62 %) while the other two phases of the
# same child ran cpu-flat (stateful 0.724 record, metapath 0.645).
# Same composite widths local[2] -> local[8], 1.5M corpus, round-5
# pins; node2vec_chained stays first so the shared CSR-cache build
# lands in the same phase as in v5x/v5q (comparable units).
# Run UNCONTENDED; do not recompile target/classes while this runs.
set -x
cd /root/repo
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false -Xmx32g"
export SPARK_GRAFT_PHASES="node2vec_chained,node2vec_reject"

mkdir -p target/campaigns
for i in ${IDX:-1}; do  # unquoted: IDX="1 2" iterates (ADVICE r5)
  java $OPENS $JOPTS -cp "$CP" graft.Scaling 1500000 2 "BENCH/PAIR_v5y_1500k_r${i}.md" \
    > "target/campaigns/v5y_1500k_r${i}.log" 2>&1
  echo "v5y r${i} rc=$?" >> target/campaigns/status
  cp /tmp/graft-scaling-2.tsv "BENCH/PAIR_v5y_1500k_r${i}_N.tsv"  2>/dev/null
  cp /tmp/graft-scaling-8.tsv "BENCH/PAIR_v5y_1500k_r${i}_4N.tsv" 2>/dev/null
done
echo "v5y repeats complete" >> target/campaigns/status
