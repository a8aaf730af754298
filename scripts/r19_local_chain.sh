#!/bin/bash
# Round-19 measurement stage: full Bench per decade on the round-19
# tree (probe keep-through, hash-join ladder + stats-blind hints,
# minhash16 memo, CMS pre-aggregation, single pair dedup) for the
# scaling-curve refit and the r18->r19 drift look. Same invocation as
# the r17 BENCH_LOCAL_* artifacts (repeat=3 medians, untimed warm
# pass); the r19 chain also pins q_knn_recall at sf1.0.
set -u
cd /root/repo
OUT=/root/repo
run() { # sfdir outfile
  SPARK_GRAFT_SF_DIR="$1" SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.Bench" > "/tmp/r19_bench_$(basename "$2").log" 2>&1
  grep -oE "\{\"(errors|retimed|still_over_expect|spread|queries)\".*" \
    "/tmp/r19_bench_$(basename "$2").log" | tail -1 > "$2"
  [ -s "$2" ] || { echo "empty bench line for $1" >&2; exit 1; }
}
run /root/testdata/sf0.001    "$OUT/BENCH_LOCAL_sf0001_r19.json"
run /root/testdata/sf0.01     "$OUT/BENCH_LOCAL_sf001_r19.json"
run /root/testdata/sf0.1      "$OUT/BENCH_LOCAL_r19.json"
run /root/repo/testdata_sf1.0 "$OUT/BENCH_LOCAL_sf1_r19.json"
# per-round graph-recall pin at sf1.0: one Verify dump of the
# q_knn_recall contract row, recorded as a JSON artifact
SPARK_GRAFT_ONLY=q_knn_recall SPARK_DRIVER_MEM=16g \
  sbt -batch "runMain graft.Verify /root/repo/testdata_sf1.0 /tmp/r19_knnrecall" \
  > /tmp/r19_knnrecall.log 2>&1
python3 - <<'EOF'
import duckdb, json
row = duckdb.sql(
    "SELECT * FROM '/tmp/r19_knnrecall/q_knn_recall/*.parquet'").fetchone()
cols = [d[0] for d in duckdb.sql(
    "SELECT * FROM '/tmp/r19_knnrecall/q_knn_recall/*.parquet'").description]
with open('/root/repo/bench_ref/KNN_RECALL_sf1_r19.json', 'w') as f:
    json.dump(dict(zip(cols, [int(v) for v in row])), f)
    f.write('\n')
EOF
echo DONE_LOCAL_CHAIN
