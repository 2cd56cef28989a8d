#!/bin/bash
# v5z: one north-rule pair at 6M conversations (~130M edges) — a FOURTH
# input-size point for the pagerank/cc asymptote series
# (v5h: 500k -> 1.5M -> 3M at local[8] -> local[32]; pagerank read
# 0.672-0.781 cpu-flat at 3M). Same protocol as v5h/v5p: v3 plan pins
# (shuffle partitions + walk buckets fixed at 32), v4 envelope (bare
# java, -Xmx32g, network.timeout=600s), v5g pins (default G1 GC; AQE
# coalescePartitions.parallelismFirst=false), widths the brief names.
# Phases: derive (timed) + the two north-rule gather-scatter phases.
# Run UNCONTENDED; do not recompile target/classes while this runs.
set -x
cd /root/repo
mkdir -p target/campaigns
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# HEAP: both children inherit the parent's -Xmx (Scaling.spawn forwards
# it), so the heap is LEVEL-CONSTANT whatever it is set to. r1 ran the
# series' 32g and the local[32] child GC-thrashed at 6M (gc 548/909 s):
# with shuffle partitions pinned at 32, the 4N level runs all 32
# partitions concurrently vs 8-at-a-time at N — 4x the simultaneous
# working set on the same heap, a sandbox artifact a real 4N cluster
# does not have (each executor brings its own heap). r2+ use 64g at
# BOTH levels to restore the cluster-like memory-per-concurrent-task.
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false -Xmx${HEAP:-32g}"
export SPARK_GRAFT_PHASES="derive_edges,pagerank_10it,cc_conv"

for i in ${IDX:-1}; do  # unquoted: IDX="1 2" iterates (ADVICE r5)
  # stale-TSV guard (ADVICE r5): campaigns share the /tmp paths — delete
  # before the run and only copy results when the run succeeded
  rm -f /tmp/graft-scaling-8.tsv /tmp/graft-scaling-32.tsv
  java $OPENS $JOPTS -cp "$CP" graft.Scaling 6000000 8 "BENCH/PAIR_v5z_6M_r${i}.md" \
    > "target/campaigns/v5z_6M_r${i}.log" 2>&1
  rc=$?
  echo "v5z r${i} rc=$rc" >> target/campaigns/status
  if [ "$rc" -eq 0 ]; then
    cp /tmp/graft-scaling-8.tsv  "BENCH/PAIR_v5z_6M_r${i}_N.tsv"
    cp /tmp/graft-scaling-32.tsv "BENCH/PAIR_v5z_6M_r${i}_4N.tsv"
  fi
done
echo "v5z complete" >> target/campaigns/status
