#!/bin/bash
# v5u: a fresh whole-workload composite pair on the round-5 protocol
# envelope (bare java, -Xmx32g, default G1, AQE parallelismFirst pin,
# network.timeout=600s; shuffle partitions + chained buckets pinned at
# 32 inside graft.Scaling). Phase set = the historical v3 composite
# envelope EXACTLY (derive, pagerank_10it, cc_conv, both chained walks,
# ann) so the composite extends the five-campaign series
# (0.730/0.738/0.763/0.650/0.892) with a sixth sample on the r5 code;
# the newer phases (stateful/reject/metapath) keep their own
# single-phase campaigns (v4/v5s/v5t) for attribution reasons.
# Run UNCONTENDED; do not recompile target/classes while this runs.
set -x
cd /root/repo
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false -Xmx32g"
export SPARK_GRAFT_PHASES="derive_edges,pagerank_10it,cc_conv,deepwalk_chained,node2vec_chained,ann_cosine_all_pairs"

mkdir -p target/campaigns
for i in "${IDX:-4}"; do
  java $OPENS $JOPTS -cp "$CP" graft.Scaling 1500000 2 "BENCH/PAIR_v5u_1500k_r${i}.md" \
    > "target/campaigns/v5u_1500k_r${i}.log" 2>&1
  echo "v5u r${i} rc=$?" >> target/campaigns/status
  cp /tmp/graft-scaling-2.tsv "BENCH/PAIR_v5u_1500k_r${i}_N.tsv"  2>/dev/null
  cp /tmp/graft-scaling-8.tsv "BENCH/PAIR_v5u_1500k_r${i}_4N.tsv" 2>/dev/null
done
echo "v5u repeats complete" >> target/campaigns/status
