#!/bin/bash
# v5zz: derive_edges-only pairs at the brief's widths local[8] -> local[32],
# 1.5M corpus — hunting the wide-width clean sample the v5h/v5p campaigns
# never caught (best 0.313 at +16% cpu, six samples spanning 0.098-0.934;
# BASELINE.md attributes the spread to the single-disk parquet sink + host
# mood). Round-5 pins (G1, AQE parallelismFirst=false), -Xmx32g (1.5M fits).
# Run UNCONTENDED; do not recompile target/classes while this runs.
set -x
cd /root/repo
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false -Xmx32g"
export SPARK_GRAFT_PHASES="derive_edges"

mkdir -p target/campaigns
for i in ${IDX:-1}; do  # unquoted: IDX="1 2" iterates (ADVICE r5)
  java $OPENS $JOPTS -cp "$CP" graft.Scaling 1500000 8 "BENCH/PAIR_v5zz_1500k_r${i}.md" \
    > "target/campaigns/v5zz_1500k_r${i}.log" 2>&1
  echo "v5zz r${i} rc=$?" >> target/campaigns/status
  cp /tmp/graft-scaling-8.tsv  "BENCH/PAIR_v5zz_1500k_r${i}_N.tsv"  2>/dev/null
  cp /tmp/graft-scaling-32.tsv "BENCH/PAIR_v5zz_1500k_r${i}_4N.tsv" 2>/dev/null
done
echo "v5zz complete" >> target/campaigns/status
