#!/bin/bash
# Round-19 stage: FULL query surface at the fifth decade on the
# round-19 tree (probe keep-through, hash-join ladder, minhash16 memo,
# CMS pre-aggregation, single pair dedup). Fault isolation per the
# wedge protocol: one JVM for the full build set, then family-sized
# query JVMs; merge with r14_merge_sf10.py. Same structure as
# scripts/r18_sf10_full.sh (which round 18 never got to run), with the
# build list derived from Bench.scala so new memo lines
# (_build_minhash16, _build_chunk_ft, _build_knn_cand) are included.
set -u
cd /root/repo
OUT=/root/repo/bench_ref/sf10_r19
mkdir -p "$OUT"
run() { # tag only-list
  local tag="$1" onl="$2"
  SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf10 SPARK_GRAFT_ONLY="$onl" \
  SPARK_GRAFT_BENCH_REPEAT=1 SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.Bench" > "$OUT/${tag}.log" 2>&1
  grep -oE "\{\"(errors|retimed|still_over_expect|spread|queries)\".*" "$OUT/${tag}.log" \
    | tail -1 > "$OUT/${tag}.json"
  [ -s "$OUT/${tag}.json" ] || { echo "empty bench line for ${tag}" >&2; exit 1; }
}
python3 scripts/r14_sf10_groups.py /tmp/verify01d/oracle_sql.json "$OUT" \
  || { echo "group partitioning failed" >&2; exit 1; }
# build list from Bench.scala itself (the groups script's list predates
# the r18/r19 memo lines)
grep -oE '"_build_[a-z0-9_]+"' src/main/scala/graft/Bench.scala \
  | tr -d '"' | paste -sd, > "$OUT/group_builds.txt"
[ -s "$OUT/group_builds.txt" ] || { echo "empty group_builds.txt" >&2; exit 1; }
run builds "$(cat "$OUT/group_builds.txt")"
for g in "$OUT"/group_q*.txt; do
  tag=$(basename "$g" .txt)
  run "$tag" "$(cat "$g")"
done
# isolated _build_ivf_pairs pricing (r17 verdict item #2 / r18 #4): a
# fresh JVM whose timed lines separate the pair build from every
# dependency it memoizes through
run pairs_isolated "_build_normed,_build_ivf2_assign,_build_knn_edges,_build_knn_cand,_build_ivf_pairs"
python3 scripts/r14_merge_sf10.py "$OUT" -o /root/repo/BENCH_LOCAL_sf10_r19.json
echo DONE > "$OUT/done"
