#!/bin/bash
# Round-17 measurement stage: full Bench per decade on the round-17
# tree (NN-descent-refined kNN graph, query-phase re-timer) for the
# scaling-curve refit and the r16->r17 drift look. Same invocation as
# the r16 BENCH_LOCAL_* artifacts (repeat=3 medians, untimed warm
# pass). New in r17: the bench line may also start with
# "still_over_expect"; and the chain records the q_knn_recall row at
# sf1.0 (KNN_RECALL_sf1_r17.json) so the graph-recall decay law is
# tracked per-round, not per-sweep.
set -u
cd /root/repo
OUT=/root/repo
run() { # sfdir outfile
  SPARK_GRAFT_SF_DIR="$1" SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.Bench" > "/tmp/r17_bench_$(basename "$2").log" 2>&1
  grep -oE "\{\"(errors|retimed|still_over_expect|spread|queries)\".*" \
    "/tmp/r17_bench_$(basename "$2").log" | tail -1 > "$2"
  # ADVICE r17: a failed sbt run must not hand scaling_curve.py a
  # silent empty artifact
  [ -s "$2" ] || { echo "empty bench line for $1" >&2; exit 1; }
}
run /root/testdata/sf0.001    "$OUT/BENCH_LOCAL_sf0001_r17.json"
run /root/testdata/sf0.01     "$OUT/BENCH_LOCAL_sf001_r17.json"
run /root/testdata/sf0.1      "$OUT/BENCH_LOCAL_r17.json"
run /root/repo/testdata_sf1.0 "$OUT/BENCH_LOCAL_sf1_r17.json"
# per-round graph-recall pin at sf1.0 (judge r16 ask #6): one Verify
# dump of the q_knn_recall contract row, recorded as a JSON artifact
SPARK_GRAFT_ONLY=q_knn_recall SPARK_DRIVER_MEM=16g \
  sbt -batch "runMain graft.Verify /root/repo/testdata_sf1.0 /tmp/r17_knnrecall" \
  > /tmp/r17_knnrecall.log 2>&1
python3 - <<'EOF'
import duckdb, json
row = duckdb.sql(
    "SELECT * FROM '/tmp/r17_knnrecall/q_knn_recall/*.parquet'").fetchone()
cols = [d[0] for d in duckdb.sql(
    "SELECT * FROM '/tmp/r17_knnrecall/q_knn_recall/*.parquet'").description]
with open('/root/repo/bench_ref/KNN_RECALL_sf1_r17.json', 'w') as f:
    json.dump(dict(zip(cols, [int(v) for v in row])), f)
    f.write('\n')
EOF
python3 scripts/scaling_curve.py \
  "$OUT/BENCH_LOCAL_sf0001_r17.json" "$OUT/BENCH_LOCAL_sf001_r17.json" \
  "$OUT/BENCH_LOCAL_r17.json" "$OUT/BENCH_LOCAL_sf1_r17.json" \
  -o "$OUT/SCALING_CURVE.json" > /tmp/r17_curve.log 2>&1
echo DONE > /root/repo/bench_ref/r17_local_chain.done
