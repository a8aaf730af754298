#!/bin/bash
# Round-15 measurement stage: full Bench per decade on the post-
# migration code (routed kNN/Lloyd probe passes, PairSubB=512 pair
# budget, budgeted lshCosine, audit-population ivf1 baseline) for the
# scaling-curve refit and the r14->r15 drift look. Same invocation as
# the r14b BENCH_LOCAL_* artifacts (repeat=3 medians, untimed warm
# pass).
set -u
cd /root/repo
OUT=/root/repo
run() { # sfdir outfile
  SPARK_GRAFT_SF_DIR="$1" SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.Bench" > "/tmp/r15_bench_$(basename "$2").log" 2>&1
  grep -oE "\{\"(spread|queries)\".*" "/tmp/r15_bench_$(basename "$2").log" | tail -1 > "$2"
}
run /root/testdata/sf0.001    "$OUT/BENCH_LOCAL_sf0001_r15.json"
run /root/testdata/sf0.01     "$OUT/BENCH_LOCAL_sf001_r15.json"
run /root/testdata/sf0.1      "$OUT/BENCH_LOCAL_r15.json"
run /root/repo/testdata_sf1.0 "$OUT/BENCH_LOCAL_sf1_r15.json"
python3 scripts/scaling_curve.py \
  "$OUT/BENCH_LOCAL_sf0001_r15.json" "$OUT/BENCH_LOCAL_sf001_r15.json" \
  "$OUT/BENCH_LOCAL_r15.json" "$OUT/BENCH_LOCAL_sf1_r15.json" \
  -o "$OUT/SCALING_CURVE.json" > /tmp/r15_curve.log 2>&1
echo DONE > /root/repo/bench_ref/r15_local_chain.done
