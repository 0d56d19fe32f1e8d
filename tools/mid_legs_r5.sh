#!/bin/bash
# local[16] legs on the r5 frozen build — the midpoint that completes the
# same-build 2/8/16/32 scaling curve (shows where the host's vCPU
# oversubscription starts biting: 2->8 is clean silicon, 16 and 32 ride
# the oversubscribed half). Same steal gating and output conventions as
# the other r5 collectors. Run with collectors paused (.bench_pause) —
# this script deliberately IGNORES the pause sentinel so it can run in
# the window the others yield.
set -u
cd /root/repo
SF=${SF:-/root/testdata/sf0.1}
REP=${REP:-96}
LEGS=${LEGS:-4}
OUT=BENCH/legs_r5_mid.jsonl
FROZEN=BENCH/frozen_r5/classes
SHA=$(cat BENCH/frozen_r5/GIT_SHA 2>/dev/null || echo unknown)
MEM=${SPARK_DRIVER_MEM:-48g}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

steal_rate() {
  s0=$(awk '/^cpu /{print $9}' /proc/stat); sleep 10
  s1=$(awk '/^cpu /{print $9}' /proc/stat); echo $(( s1 - s0 ))
}

for leg in $(seq 1 $LEGS); do
  for i in $(seq 1 30); do
    r=$(steal_rate)
    if [ "$r" -lt 100 ]; then break; fi
    echo "$(date +%H:%M:%S) steal $r jiffies/10s — waiting" >&2
  done
  echo "$(date +%H:%M:%S) mid leg $leg: local[16]" >&2
  touch BENCH/.leg_running
  line=$(SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=16 \
    SPARK_GRAFT_REPLICATE=$REP SPARK_GRAFT_PIPELINE_ONLY=1 \
    java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -Xmx$MEM -Xms$MEM -cp "$FROZEN:/opt/spark/jars/*" graft.Bench 2>/dev/null \
    | grep -o '{"metric".*}' | tail -1)
  rm -f BENCH/.leg_running
  if [ -n "$line" ]; then
    echo "$line" | python3 -c "import json,sys,time; d=json.loads(sys.stdin.read()); d['git']='$SHA'; d['leg_ts']=int(time.time()); print(json.dumps(d))" >> $OUT
    echo "$line" | python3 -c "import json,sys; d=json.loads(sys.stdin.read()); print(f\"  -> cpus={d['cpus']} steal={d['total_steal_sec']} docs/s={d['docs_per_sec']:.0f}\")" >&2
  else
    echo "$(date +%H:%M:%S) mid leg $leg produced no JSON" >&2
  fi
done
echo "mid legs done" >&2
