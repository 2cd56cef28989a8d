#!/bin/bash
# Round-4 scaling campaign: one plan-constant (v2 protocol) 2->8 pair on
# the 1.5M-conv corpus, now including the node2vec_chained phase and the
# r4 chained-round barrier fix. Run UNCONTENDED; do not recompile
# target/classes while this runs (child JVMs lazy-load from it).
set -x
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-XX:+UseParallelGC -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx32g"
java $OPENS $JOPTS -cp "$CP" graft.Scaling 1500000 2 /tmp/scaling_v3_pair_2_8.md > /tmp/scaling_v3_2_8.log 2>&1
echo DONE
