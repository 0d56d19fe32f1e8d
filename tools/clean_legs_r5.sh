#!/bin/bash
# Round-5 steal-gated scaling legs. Differences from r4's collector:
#   - runs graft.Bench via PLAIN JAVA against a FROZEN copy of the compiled
#     classes (BENCH/frozen_r5/classes), so (a) every leg measures the SAME
#     build regardless of later working-tree edits (git sha recorded per
#     leg), and (b) no sbt project lock — dev work can continue between legs
#   - writes BENCH/.leg_running while a leg is in flight (dev tooling waits
#     on it) and honors a .bench_pause sentinel to yield to test runs
#   - appends the Bench JSON line + {"git":sha,"leg_ts":...} to
#     BENCH/legs_r5.jsonl
# A leg counts as CLEAN when its total_steal_sec < STEAL_OK (default 25).
set -u
cd /root/repo
SF=${SF:-/root/testdata/sf0.1}
REP=${REP:-96}
NCLEAN=${NCLEAN:-3}
STEAL_OK=${STEAL_OK:-25}
MAXLEG=${MAXLEG:-40}
OUT=BENCH/legs_r5.jsonl
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
clean_count() {
  python3 - "$1" "$STEAL_OK" <<'EOF'
import json, sys
n = 0
try:
    for line in open("BENCH/legs_r5.jsonl"):
        d = json.loads(line)
        if str(d.get("cpus")) == sys.argv[1] and d.get("total_steal_sec", 1e9) < float(sys.argv[2]):
            n += 1
except FileNotFoundError:
    pass
print(n)
EOF
}

leg=0
side=8
while [ $leg -lt $MAXLEG ]; do
  c8=$(clean_count 8); c32=$(clean_count 32)
  echo "$(date +%H:%M:%S) clean legs so far: 8->$c8 32->$c32" >&2
  if [ "$c8" -ge "$NCLEAN" ] && [ "$c32" -ge "$NCLEAN" ]; then
    echo "enough clean legs" >&2; break
  fi
  # pick the side that still needs clean legs (keep alternating when both do)
  if [ "$c8" -ge "$NCLEAN" ]; then side=32
  elif [ "$c32" -ge "$NCLEAN" ]; then side=8
  fi
  # yield to dev test runs
  while [ -f .bench_pause ]; do sleep 15; done
  # wait for a clean window (steal < 100 jiffies/10s); give up after ~15 min
  # and run anyway — a stolen leg is still recorded with its steal
  for i in $(seq 1 90); do
    r=$(steal_rate)
    if [ "$r" -lt 100 ]; then break; fi
    echo "$(date +%H:%M:%S) steal $r jiffies/10s — waiting" >&2
    while [ -f .bench_pause ]; do sleep 15; done
  done
  leg=$((leg + 1))
  echo "$(date +%H:%M:%S) leg $leg: local[$side]" >&2
  touch BENCH/.leg_running
  line=$(SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$side \
    SPARK_GRAFT_REPLICATE=$REP SPARK_GRAFT_PIPELINE_ONLY=1 \
    java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -Xmx$MEM -Xms$MEM -cp "$FROZEN:/opt/spark/jars/*" graft.Bench 2>/dev/null \
    | grep -o '{"metric".*}' | tail -1)
  rm -f BENCH/.leg_running
  if [ -n "$line" ]; then
    echo "$line" | python3 -c "import json,sys,time; d=json.loads(sys.stdin.read()); d['git']='$SHA'; d['leg_ts']=int(time.time()); print(json.dumps(d))" >> $OUT
  else
    echo "$(date +%H:%M:%S) leg $leg produced no JSON (crash?)" >&2
  fi
  if [ "$side" = "8" ]; then side=32; else side=8; fi
done
echo "done: $(wc -l < $OUT 2>/dev/null || echo 0) legs total" >&2
