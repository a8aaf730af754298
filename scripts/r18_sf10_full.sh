#!/bin/bash
# Round-18 stage: FULL query surface at the fifth decade on the
# round-18 tree (one-pass graph chain, scored-survivor pair source).
# Fault isolation per the wedge protocol: one JVM for the full build
# set, then family-sized query JVMs; merge with r14_merge_sf10.py.
# New in r18:
#  - an ISOLATED _build_ivf_pairs pricing group (judge ask #2: the r17
#    in-chain 48.1 s vs the audit's 3.3 s marginal needed a
#    dependency-separated reading) — its own JVM times normed/assign/
#    graph/pairs as separate lines so the pair line carries only the
#    union+distinct work
#  - the sf10 q_knn_recall pin (judge ask #5), recorded like the sf1.0
#    one so the decay trio is tracked from committed artifacts
# set -u only: a group whose Bench exits 1 (per-query errors are real
# data) must not abort the remaining groups; the silent-empty hazard is
# guarded explicitly below instead.
set -u
cd /root/repo
OUT=/root/repo/bench_ref/sf10_r18
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
# an empty/missing ONLY list would make Bench silently run nothing and
# publish a valid-looking empty artifact — fail loudly instead
python3 scripts/r14_sf10_groups.py /tmp/v18/oracle_sql.json "$OUT" \
  || { echo "group partitioning failed" >&2; exit 1; }
[ -s "$OUT/group_builds.txt" ] || { echo "empty group_builds.txt" >&2; exit 1; }
run builds "$(cat "$OUT/group_builds.txt")"
for g in "$OUT"/group_q*.txt; do
  tag=$(basename "$g" .txt)
  run "$tag" "$(cat "$g")"
done
# isolated _build_ivf_pairs pricing: a fresh JVM whose timed lines
# separate the pair build from every dependency it memoizes through
run pairs_isolated "_build_normed,_build_ivf2_assign,_build_knn_edges,_build_knn_cand,_build_ivf_pairs"
# sf10 graph-recall pin: one Verify dump of the q_knn_recall contract row
SPARK_GRAFT_ONLY=q_knn_recall SPARK_DRIVER_MEM=16g \
  sbt -batch "runMain graft.Verify /root/repo/testdata_sf10 /tmp/r18_knnrecall_sf10" \
  > /tmp/r18_knnrecall_sf10.log 2>&1
python3 - <<'EOF'
import duckdb, json
row = duckdb.sql(
    "SELECT * FROM '/tmp/r18_knnrecall_sf10/q_knn_recall/*.parquet'").fetchone()
cols = [d[0] for d in duckdb.sql(
    "SELECT * FROM '/tmp/r18_knnrecall_sf10/q_knn_recall/*.parquet'").description]
with open('/root/repo/bench_ref/KNN_RECALL_sf10_r18.json', 'w') as f:
    json.dump(dict(zip(cols, [int(v) for v in row])), f)
    f.write('\n')
EOF
python3 scripts/r14_merge_sf10.py "$OUT" -o /root/repo/BENCH_LOCAL_sf10_r18.json
echo DONE > "$OUT/done"
