#!/bin/bash
# Round-14 stage C: full Bench per decade (default repeat=3 medians, same
# invocation as the r13 BENCH_LOCAL_* artifacts) for the scaling curve and
# the r13->r14 drift gates, plus StreamEquiv at sf10 (VERDICT task 3).
set -u
cd /root/repo
OUT=/root/repo
run() { # sfdir outfile
  SPARK_GRAFT_SF_DIR="$1" SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.Bench" > "/tmp/r14_bench_$(basename "$2").log" 2>&1
  grep -o "{\"queries\".*" "/tmp/r14_bench_$(basename "$2").log" | tail -1 > "$2"
}
run /root/testdata/sf0.001   "$OUT/BENCH_LOCAL_sf0001_r14.json"
run /root/testdata/sf0.01    "$OUT/BENCH_LOCAL_sf001_r14.json"
run /root/testdata/sf0.1     "$OUT/BENCH_LOCAL_r14.json"
run /root/repo/testdata_sf1.0 "$OUT/BENCH_LOCAL_sf1_r14.json"
SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.StreamEquiv /root/repo/testdata_sf10" \
  > /tmp/r14_streamequiv_sf10.log 2>&1
grep -o '{"metric":"stream_equiv".*' /tmp/r14_streamequiv_sf10.log | tail -1 \
  > "$OUT/STREAM_EQUIV_sf10_r14.json"
echo DONE > /root/repo/bench_ref/r14_local_chain.done
