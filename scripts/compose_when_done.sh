#!/bin/bash
# Insurance: wait for both per-level TSVs from the concurrently-run v4
# 1.5M campaign children, compose the PAIR markdown, and commit it.
# Safe to run alongside the interactive session: commit is a no-op if
# the file was already composed and committed by hand.
cd /root/repo
for i in $(seq 1 240); do
  [ -s /tmp/graft-scaling-2.tsv ] && [ -s /tmp/graft-scaling-8.tsv ] && break
  sleep 15
done
[ -s /tmp/graft-scaling-2.tsv ] && [ -s /tmp/graft-scaling-8.tsv ] || exit 1
python3 scripts/compose_pair.py /tmp/graft-scaling-2.tsv /tmp/graft-scaling-8.tsv \
  2 1500000 BENCH/PAIR_v4_2_8.md target/campaigns/v4_note.md \
  > target/campaigns/compose.log 2>&1
cp /tmp/graft-scaling-2.tsv BENCH/PAIR_v4_2_8_N.tsv
cp /tmp/graft-scaling-8.tsv BENCH/PAIR_v4_2_8_4N.tsv
git add BENCH/PAIR_v4_2_8.md BENCH/PAIR_v4_2_8_N.tsv BENCH/PAIR_v4_2_8_4N.tsv
git diff --cached --quiet || git commit -m "v4 1.5M scaling pair: concurrent-level run, composed from child TSVs

No-Verification-Needed: bench-report data only"
