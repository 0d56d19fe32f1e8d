#!/bin/bash
# Round-5 leg supervisor: keeps exactly one collector running at a time,
# alternating a small below-ceiling burst (local[2]/local[8], the pair
# where clean windows are attainable and raw 0.8 is directly testable)
# with the contested local[8]/local[32] hunt. Never overlaps collectors —
# overlapping Spark jobs would corrupt each other's throughput readings.
set -u
cd /root/repo
while true; do
  # wait out any already-running collector (from a previous invocation)
  while pgrep -f 'clean_legs_r5.sh|small_legs_r5.sh' | grep -qv $$; do sleep 30; done
  LEGS=8 bash tools/small_legs_r5.sh >> BENCH/legs_r5_small.log 2>&1
  MAXLEG=20 bash tools/clean_legs_r5.sh >> BENCH/legs_r5.log 2>&1
done
