#!/bin/bash
# Targeted bench of a query subset, retried until a calm window: runs
# graft.Bench restricted to $2 (comma list) with reps=$3 (default 3),
# then checks the artifact's telemetry for accepted passes at
# steal_frac <= 0.03; retries up to 4 times otherwise.
# Usage: targeted_bench.sh <artifact.json> <q1,q2,...> [reps]
set -u
ART="$1"; ONLY="$2"; REPS="${3:-3}"
for attempt in 1 2 3 4; do
  # wait for a calm 10 s sample before burning a run
  for i in $(seq 1 60); do
    s0=$(awk '/^cpu /{print $9}' /proc/stat); b0=$(awk '/^cpu /{print $2+$3+$4}' /proc/stat)
    sleep 10
    s1=$(awk '/^cpu /{print $9}' /proc/stat); b1=$(awk '/^cpu /{print $2+$3+$4}' /proc/stat)
    st=$((s1-s0)); bu=$((b1-b0))
    frac=$(python3 -c "print(($st)/max($st+$bu,1))")
    ok=$(python3 -c "print(1 if $frac < 0.02 else 0)")
    [ "$ok" = "1" ] && break
    echo "[targeted] waiting out steal=$frac (probe $i)"
  done
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_ONLY="$ONLY" SPARK_GRAFT_BENCH_REPS="$REPS" \
    SPARK_GRAFT_BENCH_SLOPE_DIR= SPARK_GRAFT_BENCH_ARTIFACT="$ART" \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -E "^\[info\] (#|\{)" | tail -2
  bad=$(python3 - "$ART" <<'EOF'
import json,sys
t=json.load(open(sys.argv[1]))["telemetry"]
acc=[p for p in t if not p.get("discarded")]
print(sum(1 for p in acc if p["steal_frac"]>0.03))
EOF
)
  if [ "$bad" = "0" ]; then echo "[targeted] CLEAN artifact $ART"; exit 0; fi
  echo "[targeted] attempt $attempt contaminated ($bad stormy accepted passes), retrying"
done
echo "[targeted] giving up; last artifact kept (suspect)"
exit 1
