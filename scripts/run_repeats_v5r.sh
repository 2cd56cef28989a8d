#!/bin/bash
# v5r: post-driver-tail samples for BOTH chained walk phases at the v3c
# widths local[2] -> local[8], 1.5M corpus, 3 repeat pairs. Running the
# two walk phases together reproduces the full-workload attribution
# exactly (starts build + shared CSR-cache build land in deepwalk's
# delta, node2vec's delta is the walk alone, 793 MB), so these rows are
# DIRECTLY comparable to v3c's pre-tail 0.613 (deepwalk) / 0.409
# (node2vec) — unlike v5q, whose single-phase unit charged the CSR
# build to node2vec. 2->8 is also the width regime where this host's
# DRAM ceiling bites least (the five clean r3/r4 campaigns all ran it).
set -x
cd /root/repo
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false -Xmx32g"
export SPARK_GRAFT_PHASES="deepwalk_chained,node2vec_chained"

mkdir -p target/campaigns
for i in 6; do
  java $OPENS $JOPTS -cp "$CP" graft.Scaling 1500000 2 "BENCH/PAIR_v5r_1500k_r${i}.md" \
    > "target/campaigns/v5r_1500k_r${i}.log" 2>&1
  echo "v5r r${i} rc=$?" >> target/campaigns/status
  cp /tmp/graft-scaling-2.tsv "BENCH/PAIR_v5r_1500k_r${i}_N.tsv"  2>/dev/null
  cp /tmp/graft-scaling-8.tsv "BENCH/PAIR_v5r_1500k_r${i}_4N.tsv" 2>/dev/null
done
echo "v5r repeats complete" >> target/campaigns/status
