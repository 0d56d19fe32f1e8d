#!/bin/bash
# Steal-gated scaling legs: wait for a clean window (near-zero /proc/stat
# steal over 10s), then run one PIPELINE_ONLY Bench leg, alternating
# local[8] / local[32]. Appends one JSON line per leg to BENCH/legs_r4.jsonl
# (the Bench line, with "cpus" inside). Stops when each parallelism has
# NCLEAN legs measured with total_steal_sec < STEAL_OK, or after MAXLEG legs.
set -u
cd /root/repo
SF=${SF:-/root/testdata/sf0.1}
REP=${REP:-96}
NCLEAN=${NCLEAN:-2}
STEAL_OK=${STEAL_OK:-25}
MAXLEG=${MAXLEG:-14}
OUT=BENCH/legs_r4.jsonl
steal_rate() {
  s0=$(awk '/^cpu /{print $9}' /proc/stat); sleep 10
  s1=$(awk '/^cpu /{print $9}' /proc/stat); echo $(( (s1 - s0) ))
}
clean_count() {
  python3 - "$1" <<'EOF'
import json, sys
n = 0
try:
    for line in open("BENCH/legs_r4.jsonl"):
        d = json.loads(line)
        if str(d.get("cpus")) == sys.argv[1] and d.get("total_steal_sec", 1e9) < float(__import__("os").environ.get("STEAL_OK", "25")):
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
  # wait for a clean window (steal < 100 jiffies/10s = <1 cpu-sec/sec*0.1)
  for i in $(seq 1 90); do
    r=$(steal_rate)
    if [ "$r" -lt 100 ]; then break; fi
    echo "$(date +%H:%M:%S) steal $r jiffies/10s — waiting" >&2
  done
  leg=$((leg + 1))
  echo "$(date +%H:%M:%S) leg $leg: local[$side]" >&2
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$side \
    SPARK_GRAFT_REPLICATE=$REP SPARK_GRAFT_PIPELINE_ONLY=1 \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*}' | tail -1 >> $OUT
  if [ "$side" = "8" ]; then side=32; else side=8; fi
done
echo "done: $(wc -l < $OUT) legs total" >&2
