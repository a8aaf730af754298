#!/bin/bash
# Round-14 stage B (post-migration): pair-family build probe across five decades.
# Evidence for the ROUTED production pair path (post-migration: the
# pair builds probe via top-3-coarse x top-8-fine routing with the
# per-bucket-salted sub-bucket split). _build_ivf_pairs/_build_km_pairs
# should drop their remaining single-level O(N*K) probe-pass cost at
# the fifth decade; _build_ivf1_pairs is the retained single-level
# audit baseline measured side by side.
# Launch with setsid (survives the caller); writes pairs_r14b_<tag>.json
# per decade plus pairs_r14b.done when finished.
set -u
cd /root/repo
OUT=/root/repo/bench_ref
mkdir -p "$OUT"
# Same relative order as the full Bench build Seq so dep attribution
# matches the r13 full-set numbers for these entries.
ONLY=_build_normed,_build_exact_pairs,_build_ivf_pairs,_build_kmeans_cents,_build_ivf_assign,_build_ivf2_assign,_build_km_pairs,_build_km_assign,_build_knn_edges,_build_ivf1_pairs
for pair in "/root/testdata/sf0.001:sf0001" "/root/testdata/sf0.01:sf001" \
            "/root/testdata/sf0.1:sf01" "/root/repo/testdata_sf1.0:sf1" \
            "/root/repo/testdata_sf10:sf10"; do
  dir="${pair%%:*}"; tag="${pair##*:}"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_ONLY="$ONLY" \
  SPARK_GRAFT_BENCH_REPEAT=1 SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.Bench" > "$OUT/pairs_r14b_${tag}.log" 2>&1
  grep -o '{"queries".*' "$OUT/pairs_r14b_${tag}.log" | tail -1 \
    > "$OUT/pairs_r14b_${tag}.json"
done
echo DONE > "$OUT/pairs_r14b.done"
