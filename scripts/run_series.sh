#!/bin/bash
# Round-5 three-size scaling campaign series (protocol v4 = v3 + r5 code).
#
# Launches graft.Scaling with a BARE java (not sbt) so the parent — and
# therefore the spawned per-level children, which inherit the parent's
# -Xmx/-XX/-D args — runs with the SAME JVM envelope as every r3/r4
# campaign: -Xmx32g + UseParallelGC. The first attempt of this series
# went through `sbt runMain` with SPARK_DRIVER_MEM=16g and the halved
# heap GC-thrashed both levels (derive gc-sec 171→803 vs v3's 7→15),
# producing a confounded sample preserved as
# BENCH/PAIR_v4_500k_16g_confounded.md. Heap size is part of the
# protocol.
#
# Prereq: target/scala-2.13/classes is current (`sbt -batch compile`).
# Run UNCONTENDED; do not recompile while this runs (children lazy-load
# classes from the directory).
# Order: 1.5M first (direct comparison vs the r4 v3c headline at the size
# where node2vec_chained measured 0.41), then 3M (the new asymptote
# point), then 500k — so a wall-clock cutoff loses the least-informative
# point, not the most.
set -x
cd /root/repo
mkdir -p target/campaigns
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# spark.network.timeout raised: ParallelGC full collections of the 32g
# heap on a 2-thread (ActiveProcessorCount-pinned) N level can pause
# >120 s, and the default heartbeat timeout then REMOVES the local
# executor and fails the run (observed 20:35 pagerank_10it, 1.5M corpus:
# "no recent heartbeats: 125758 ms exceeds timeout 120000 ms"). The
# pause itself still lands honestly in the phase's gc-sec column.
JOPTS="-XX:+UseParallelGC -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s -Xmx32g"
java $OPENS $JOPTS -cp "$CP" graft.Scaling 1500000 2 BENCH/PAIR_v4_2_8.md > target/campaigns/1500k.log 2>&1
echo "1500k rc=$?" >> target/campaigns/status
java $OPENS $JOPTS -cp "$CP" graft.Scaling 3000000 2 BENCH/PAIR_v4_3M_2_8.md > target/campaigns/3M.log 2>&1
echo "3M rc=$?" >> target/campaigns/status
java $OPENS $JOPTS -cp "$CP" graft.Scaling 500000 2 BENCH/PAIR_v4_500k_2_8.md > target/campaigns/500k.log 2>&1
echo "500k rc=$?" >> target/campaigns/status
echo "series complete" >> target/campaigns/status
