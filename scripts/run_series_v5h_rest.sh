#!/bin/bash
# Continuation of run_series_v5h.sh with the last two sizes REORDERED
# (500k before 3M): the host is again in its degraded-service mood
# (pagerank iters 43-110 s at local[8]/1.5M vs 15.5 s on the r4-era
# host; cumulative child stime 2.5x utime — kernel-side stalls), so the
# 3M pair may run 2-3x its nominal cost. Running 500k second guarantees
# a complete three-size v5h series even if the wall clock cuts the 3M
# point; 3M runs last as the stretch asymptote point.
set -x
cd /root/repo
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false -Xmx32g"

# wait for the in-flight 1.5M pair (pid passed as $1), then bookkeep it
while kill -0 "$1" 2>/dev/null; do sleep 20; done
echo "v5h 1500k done (pid $1 gone)" >> target/campaigns/status
cp /tmp/graft-scaling-8.tsv  BENCH/PAIR_v5h_1500k_8_32_N.tsv  2>/dev/null
cp /tmp/graft-scaling-32.tsv BENCH/PAIR_v5h_1500k_8_32_4N.tsv 2>/dev/null

run_one() {
  local nconvs=$1 tag=$2
  java $OPENS $JOPTS -cp "$CP" graft.Scaling "$nconvs" 8 "BENCH/PAIR_v5h_${tag}_8_32.md" \
    > "target/campaigns/v5h_${tag}.log" 2>&1
  echo "v5h ${tag} rc=$?" >> target/campaigns/status
  cp /tmp/graft-scaling-8.tsv  "BENCH/PAIR_v5h_${tag}_8_32_N.tsv"  2>/dev/null
  cp /tmp/graft-scaling-32.tsv "BENCH/PAIR_v5h_${tag}_8_32_4N.tsv" 2>/dev/null
}

run_one 500000 500k
run_one 3000000 3M
echo "v5h series complete" >> target/campaigns/status
