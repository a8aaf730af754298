#!/bin/bash
# Round-14 stage A: pair-family build probe across five decades.
# Evidence for the capped production pair path (VERDICT r13 task 1):
# _build_ivf_pairs / _build_km_pairs / _build_knn_edges must lose their
# super-linear tails now that ivfPairs/knnEdgesFor enumerate pairs only
# among each bucket's PairCapB hash-min members.
# Launch with setsid (survives the caller); writes pairs_r14_<tag>.json
# per decade plus pairs_r14.done when finished.
set -u
cd /root/repo
OUT=/root/repo/bench_ref
mkdir -p "$OUT"
# Same relative order as the full Bench build Seq so dep attribution
# matches the r13 full-set numbers for these entries.
ONLY=_build_normed,_build_exact_pairs,_build_ivf_pairs,_build_kmeans_cents,_build_ivf_assign,_build_ivf2_assign,_build_km_pairs,_build_km_assign,_build_knn_edges
for pair in "/root/testdata/sf0.001:sf0001" "/root/testdata/sf0.01:sf001" \
            "/root/testdata/sf0.1:sf01" "/root/repo/testdata_sf1.0:sf1" \
            "/root/repo/testdata_sf10:sf10"; do
  dir="${pair%%:*}"; tag="${pair##*:}"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_ONLY="$ONLY" \
  SPARK_GRAFT_BENCH_REPEAT=1 SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.Bench" > "$OUT/pairs_r14_${tag}.log" 2>&1
  grep -o '{"queries".*' "$OUT/pairs_r14_${tag}.log" | tail -1 \
    > "$OUT/pairs_r14_${tag}.json"
done
echo DONE > "$OUT/pairs_r14.done"
