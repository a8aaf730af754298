#!/bin/bash
# Round-16 measurement stage: full Bench per decade on the round-16
# tree (4x4@256 kNN-graph probe, strided q_minhash_acc, self-
# adjudicating build re-time) for the scaling-curve refit and the
# r15->r16 drift look. Same invocation as the r15 BENCH_LOCAL_*
# artifacts (repeat=3 medians, untimed warm pass).
set -u
cd /root/repo
OUT=/root/repo
run() { # sfdir outfile
  SPARK_GRAFT_SF_DIR="$1" SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.Bench" > "/tmp/r16_bench_$(basename "$2").log" 2>&1
  grep -oE "\{\"(errors|retimed|spread|queries)\".*" \
    "/tmp/r16_bench_$(basename "$2").log" | tail -1 > "$2"
}
run /root/testdata/sf0.001    "$OUT/BENCH_LOCAL_sf0001_r16.json"
run /root/testdata/sf0.01     "$OUT/BENCH_LOCAL_sf001_r16.json"
run /root/testdata/sf0.1      "$OUT/BENCH_LOCAL_r16.json"
run /root/repo/testdata_sf1.0 "$OUT/BENCH_LOCAL_sf1_r16.json"
python3 scripts/scaling_curve.py \
  "$OUT/BENCH_LOCAL_sf0001_r16.json" "$OUT/BENCH_LOCAL_sf001_r16.json" \
  "$OUT/BENCH_LOCAL_r16.json" "$OUT/BENCH_LOCAL_sf1_r16.json" \
  -o "$OUT/SCALING_CURVE.json" > /tmp/r16_curve.log 2>&1
echo DONE > /root/repo/bench_ref/r16_local_chain.done
