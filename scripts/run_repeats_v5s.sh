#!/bin/bash
# v5s: first N->4N evidence for the rejection-sampling engine family —
# node2vec_reject (dartboard second-order engine, outlier regime p=0.5:
# appendix live, lb pre-accepts live, partial membership join live) at
# the v3c widths local[2] -> local[8], 1.5M corpus, 2 repeat pairs.
# Single-phase filtered run: the rejStarts build + session CSR-cache
# build land in the phase's own delta (self-contained attribution, per
# the Scaling scaladoc); work constancy must be exact across levels
# (hash-keyed RNG; trial counts plan-independent).
set -x
cd /root/repo
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false -Xmx32g"
export SPARK_GRAFT_PHASES="node2vec_reject"

mkdir -p target/campaigns
for i in ${IDX:-5}; do  # unquoted: IDX="1 2" iterates (ADVICE r5)
  java $OPENS $JOPTS -cp "$CP" graft.Scaling 1500000 2 "BENCH/PAIR_v5s_1500k_r${i}.md" \
    > "target/campaigns/v5s_1500k_r${i}.log" 2>&1
  echo "v5s r${i} rc=$?" >> target/campaigns/status
  cp /tmp/graft-scaling-2.tsv "BENCH/PAIR_v5s_1500k_r${i}_N.tsv"  2>/dev/null
  cp /tmp/graft-scaling-8.tsv "BENCH/PAIR_v5s_1500k_r${i}_4N.tsv" 2>/dev/null
done
echo "v5s repeats complete" >> target/campaigns/status
