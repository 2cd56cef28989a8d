#!/bin/bash
# Round-5 final scaling series — protocol v5h:
#   v3 plan pins (shuffle partitions + walk buckets fixed at 32)
# + v4 envelope (bare java, -Xmx32g, network.timeout=600s)
# + v5g fixes, both validated by the committed v5g 2->8 pair:
#     - default G1 GC (drop -XX:+UseParallelGC): eliminates the
#       ParallelGC full-pause pathology this host shows on the
#       gather-scatter phases (pagerank gc-sec 62-1736 -> 2-4)
#     - -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false:
#       AQE coalescing becomes advisory-size-driven, so the post-shuffle
#       partition count — and therefore the CC pre-contraction quality
#       and global round count — is identical at every level (v5g work
#       column: 21,629,256 edge-visits at BOTH levels; previously
#       2 rounds at local[2] vs 5-6 at local[8]/[32])
# at the widths the task brief itself names: local[8] -> local[32].
# Wide JVMs average over this host's per-core service variance that
# made the narrow 2-core-pinned children unstable (BASELINE.md,
# "Host calibration" section).
#
# Order: 1.5M first (direct comparison against the r4 v3c headline at
# the size where node2vec_chained measured 0.41 pre-tail), then 3M
# (the open r4-VERDICT-#3 asymptote point), then 500k — a wall-clock
# cutoff loses the least-informative point.
set -x
cd /root/repo
mkdir -p target/campaigns
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false -Xmx32g"

run_one() {
  local nconvs=$1 tag=$2
  java $OPENS $JOPTS -cp "$CP" graft.Scaling "$nconvs" 8 "BENCH/PAIR_v5h_${tag}_8_32.md" \
    > "target/campaigns/v5h_${tag}.log" 2>&1
  echo "v5h ${tag} rc=$?" >> target/campaigns/status
  cp /tmp/graft-scaling-8.tsv  "BENCH/PAIR_v5h_${tag}_8_32_N.tsv"  2>/dev/null
  cp /tmp/graft-scaling-32.tsv "BENCH/PAIR_v5h_${tag}_8_32_4N.tsv" 2>/dev/null
}

run_one 1500000 1500k
run_one 3000000 3M
run_one 500000 500k
echo "v5h series complete" >> target/campaigns/status
