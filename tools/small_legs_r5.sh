#!/bin/bash
# Same-build local[2] vs local[8] scaling legs on the r5 frozen classes —
# the N->4N pair BELOW the host's vCPU-oversubscription ceiling (2+8 <= 32
# vCPUs, so guest-side SMT/oversubscription effects are minimal and clean
# steal windows are actually attainable). Complements clean_legs_r5.sh's
# 8->32 hunt; same steal gating, same frozen build, same REP.
set -u
cd /root/repo
SF=${SF:-/root/testdata/sf0.1}
REP=${REP:-96}
LEGS=${LEGS:-8}
OUT=BENCH/legs_r5_small.jsonl
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

side=2
for leg in $(seq 1 $LEGS); do
  while [ -f .bench_pause ]; do sleep 15; done
  for i in $(seq 1 30); do
    r=$(steal_rate)
    if [ "$r" -lt 100 ]; then break; fi
    echo "$(date +%H:%M:%S) steal $r jiffies/10s — waiting" >&2
    while [ -f .bench_pause ]; do sleep 15; done
  done
  echo "$(date +%H:%M:%S) small leg $leg: local[$side]" >&2
  touch BENCH/.leg_running
  line=$(SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$side \
    SPARK_GRAFT_REPLICATE=$REP SPARK_GRAFT_PIPELINE_ONLY=1 \
    java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -Xmx$MEM -Xms$MEM -cp "$FROZEN:/opt/spark/jars/*" graft.Bench 2>/dev/null \
    | grep -o '{"metric".*}' | tail -1)
  rm -f BENCH/.leg_running
  if [ -n "$line" ]; then
    echo "$line" | python3 -c "import json,sys,time; d=json.loads(sys.stdin.read()); d['git']='$SHA'; d['leg_ts']=int(time.time()); print(json.dumps(d))" >> $OUT
    echo "$line" | python3 -c "import json,sys; d=json.loads(sys.stdin.read()); print(f\"  -> cpus={d['cpus']} steal={d['total_steal_sec']} docs/s={d['docs_per_sec']:.0f}\")" >&2
  else
    echo "$(date +%H:%M:%S) small leg $leg produced no JSON" >&2
  fi
  if [ "$side" = "2" ]; then side=8; else side=2; fi
done
echo "small legs done" >&2
