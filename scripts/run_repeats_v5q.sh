#!/bin/bash
# v5q: repeat-sampling the node2vec_chained phase alone at the 1.5M
# corpus — VERDICT r4 #1's done-criterion names this phase/size
# (">= 0.65 at the 1.5M corpus with o(|CSR|) tail shuffle"). The r5
# driver tail removed the full-CSR tail exchange (shuffle 841 -> 793 MB,
# zero-exchange tail logs at both levels); the one v5h wall sample read
# 0.470 with cpu-sec FALLING 215 -> 193 (the N child drew the host
# stalls), so the ratio needs medians + the cpu-flatness filter like
# every other wide-width phase. One-phase pairs are cheap (~5-8 min:
# derive runs untimed as input, then the ~30-55 s phase).
set -x
cd /root/repo
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false -Xmx32g"
export SPARK_GRAFT_PHASES="node2vec_chained"

mkdir -p target/campaigns
for i in 1 2 3 4 5; do
  java $OPENS $JOPTS -cp "$CP" graft.Scaling 1500000 8 "BENCH/PAIR_v5q_1500k_r${i}.md" \
    > "target/campaigns/v5q_1500k_r${i}.log" 2>&1
  echo "v5q r${i} rc=$?" >> target/campaigns/status
  cp /tmp/graft-scaling-8.tsv  "BENCH/PAIR_v5q_1500k_r${i}_N.tsv"  2>/dev/null
  cp /tmp/graft-scaling-32.tsv "BENCH/PAIR_v5q_1500k_r${i}_4N.tsv" 2>/dev/null
done
echo "v5q repeats complete" >> target/campaigns/status
