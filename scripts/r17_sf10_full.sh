#!/bin/bash
# Round-17 stage: FULL query surface at the fifth decade on the
# round-17 tree (NN-descent-refined kNN graph at the working degree,
# query-phase re-timer). Fault isolation per the wedge
# protocol: one JVM for the full build set, then family-sized query
# JVMs. Merge with scripts/r14_merge_sf10.py afterwards.
# set -u only: a group whose Bench exits 1 (per-query errors are real
# data) must not abort the remaining groups; the silent-empty hazard is
# guarded explicitly below instead.
set -u
cd /root/repo
OUT=/root/repo/bench_ref/sf10_r17
mkdir -p "$OUT"
run() { # tag only-list
  local tag="$1" onl="$2"
  SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf10 SPARK_GRAFT_ONLY="$onl" \
  SPARK_GRAFT_BENCH_REPEAT=1 SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.Bench" > "$OUT/${tag}.log" 2>&1
  grep -oE "\{\"(errors|retimed|still_over_expect|spread|queries)\".*" "$OUT/${tag}.log" \
    | tail -1 > "$OUT/${tag}.json"
}
# an empty/missing ONLY list would make Bench silently run nothing and
# publish a valid-looking empty artifact — fail loudly instead
python3 scripts/r14_sf10_groups.py /tmp/v17/oracle_sql.json "$OUT" \
  || { echo "group partitioning failed" >&2; exit 1; }
[ -s "$OUT/group_builds.txt" ] || { echo "empty group_builds.txt" >&2; exit 1; }
run builds "$(cat "$OUT/group_builds.txt")"
for g in "$OUT"/group_q*.txt; do
  tag=$(basename "$g" .txt)
  run "$tag" "$(cat "$g")"
done
python3 scripts/r14_merge_sf10.py "$OUT" -o /root/repo/BENCH_LOCAL_sf10_r17.json
echo DONE > "$OUT/done"
