#!/bin/bash
# v5v: targeted repeat pairs for the two phases that stalled at 4N in
# ALL THREE v5u composite pairs — cc_conv and deepwalk_chained — at the
# same composite widths (2→8) and the same r5 protocol pins, but as a
# two-phase job so each lottery ticket costs ~1/4 of a full composite.
# Goal: one within-pair cpu-flat sample for each phase at these widths
# (the clean samples so far live in other campaigns: cc 0.923 at v5g
# widths, deepwalk 0.591–0.699 in v5r).
# Run UNCONTENDED; do not recompile target/classes while this runs.
set -x
cd /root/repo
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false -Xmx32g"
export SPARK_GRAFT_PHASES="cc_conv,deepwalk_chained"

mkdir -p target/campaigns
for i in "$@"; do
  java $OPENS $JOPTS -cp "$CP" graft.Scaling 1500000 2 "BENCH/PAIR_v5v_1500k_r${i}.md" \
    > "target/campaigns/v5v_1500k_r${i}.log" 2>&1
  echo "v5v r${i} rc=$?" >> target/campaigns/status
  cp /tmp/graft-scaling-2.tsv "BENCH/PAIR_v5v_1500k_r${i}_N.tsv"  2>/dev/null
  cp /tmp/graft-scaling-8.tsv "BENCH/PAIR_v5v_1500k_r${i}_4N.tsv" 2>/dev/null
done
echo "v5v repeats complete" >> target/campaigns/status
