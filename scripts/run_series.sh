#!/bin/bash
# Round-5 three-size scaling campaign series (protocol v4 = v3 + r5 code).
# Run inside tmux: logs + status under target/campaigns/.
cd /root/repo
mkdir -p target/campaigns
export SPARK_DRIVER_MEM=16g
sbt -batch "runMain graft.Scaling 500000 2 BENCH/PAIR_v4_500k_2_8.md" > target/campaigns/500k.log 2>&1
echo "500k rc=$?" >> target/campaigns/status
sbt -batch "runMain graft.Scaling 1500000 2 BENCH/PAIR_v4_2_8.md" > target/campaigns/1500k.log 2>&1
echo "1500k rc=$?" >> target/campaigns/status
sbt -batch "runMain graft.Scaling 3000000 2 BENCH/PAIR_v4_3M_2_8.md" > target/campaigns/3M.log 2>&1
echo "3M rc=$?" >> target/campaigns/status
echo "series complete" >> target/campaigns/status
