#!/bin/bash
# Scaling-efficiency evidence for BASELINE.md's north rule (N -> 4N executors,
# sandboxed as local[8] vs local[32] on the same input). Writes BENCH/BASELINE.md.
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.1}
REP=${2:-96}
mkdir -p BENCH
run() {
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$1 SPARK_GRAFT_REPLICATE=$REP SPARK_GRAFT_PIPELINE_ONLY=1 \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*}' | tail -1
}
echo "running local[8]..." >&2
J8=$(run 8)
echo "running local[32]..." >&2
J32=$(run 32)
python3 - "$J8" "$J32" <<'EOF'
import json, sys
j8, j32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
t8, t32 = j8["docs_per_sec"], j32["docs_per_sec"]
eff = (t32 / t8) / (32 / 8)
md = f"""# BENCH — scaling evidence (written by tools/bench_scaling.sh)

North rule: docs/sec throughput at two cluster sizes (N and 4N executors)
with scaling efficiency >= 0.8. No real cluster in this sandbox (32 cores),
so the same job runs at two parallelism levels on the SAME input
(shuffle partitions = cores, as the driver harness does).

| parallelism | docs | pipeline sec | docs/sec |
|---|---|---|---|
| local[8]  | {j8['pipeline_docs']} | {j8['pipeline_sec']:.2f} | {t8:.1f} |
| local[32] | {j32['pipeline_docs']} | {j32['pipeline_sec']:.2f} | {t32:.1f} |

**Scaling efficiency (8 -> 32 cores) = (docs/sec@32 / docs/sec@8) / 4 = {eff:.3f}**
Target: >= 0.8 -> {"PASS" if eff >= 0.8 else "FAIL"}

Input: {j8['sf']} documents corpus (interleaved spans), {j8['pipeline_docs']} docs;
pipeline = assemble -> chunk -> chrome -> exact+simhash dedup -> output spans
(one shuffle end-to-end). Raw bench lines below.

```json
{json.dumps(j8)}
{json.dumps(j32)}
```
"""
open("BENCH/BASELINE.md", "w").write(md)
print(md)
EOF
