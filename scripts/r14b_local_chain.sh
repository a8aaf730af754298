#!/bin/bash
# Round-14 stage D: full Bench per decade on the POST-MIGRATION code
# (routed+salted production pair path, q_ivf1_pairs/_build_ivf1_pairs)
# for the post-migration scaling-curve refit and the r14->r14b drift
# look. Same invocation as the r13/r14 BENCH_LOCAL_* artifacts
# (repeat=3 medians, untimed warm pass).
set -u
cd /root/repo
OUT=/root/repo
run() { # sfdir outfile
  SPARK_GRAFT_SF_DIR="$1" SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.Bench" > "/tmp/r14b_bench_$(basename "$2").log" 2>&1
  grep -oE "\{\"(spread|queries)\".*" "/tmp/r14b_bench_$(basename "$2").log" | tail -1 > "$2"
}
run /root/testdata/sf0.001    "$OUT/BENCH_LOCAL_sf0001_r14b.json"
run /root/testdata/sf0.01     "$OUT/BENCH_LOCAL_sf001_r14b.json"
run /root/testdata/sf0.1      "$OUT/BENCH_LOCAL_r14b.json"
run /root/repo/testdata_sf1.0 "$OUT/BENCH_LOCAL_sf1_r14b.json"
python3 scripts/scaling_curve.py \
  "$OUT/BENCH_LOCAL_sf0001_r14b.json" "$OUT/BENCH_LOCAL_sf001_r14b.json" \
  "$OUT/BENCH_LOCAL_r14b.json" "$OUT/BENCH_LOCAL_sf1_r14b.json" \
  -o "$OUT/SCALING_CURVE.json" > /tmp/r14b_curve.log 2>&1
echo DONE > /root/repo/bench_ref/r14b_local_chain.done
