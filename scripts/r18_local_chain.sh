#!/bin/bash
# Round-18 measurement stage: full Bench per decade on the round-18
# tree (one-pass graph chain: knnwork/knncand memos, scored-survivor
# pair candidates = embivf6, _build_knn_cand line) for the
# scaling-curve refit and the r17->r18 drift look. Same invocation as
# the r17 BENCH_LOCAL_* artifacts (repeat=3 medians, untimed warm
# pass). The chain records the q_knn_recall row at sf1.0
# (KNN_RECALL_sf1_r18.json) so the graph-recall decay law stays
# tracked per-round from committed artifacts.
set -u
cd /root/repo
OUT=/root/repo
run() { # sfdir outfile
  SPARK_GRAFT_SF_DIR="$1" SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.Bench" > "/tmp/r18_bench_$(basename "$2").log" 2>&1
  grep -oE "\{\"(errors|retimed|still_over_expect|spread|queries)\".*" \
    "/tmp/r18_bench_$(basename "$2").log" | tail -1 > "$2"
  # a failed sbt invocation must not hand scaling_curve.py a silent empty
  # artifact (ADVICE r17 — the r17_sf10_full.sh guard, applied here too)
  [ -s "$2" ] || { echo "empty bench line for $1" >&2; exit 1; }
}
run /root/testdata/sf0.001    "$OUT/BENCH_LOCAL_sf0001_r18.json"
run /root/testdata/sf0.01     "$OUT/BENCH_LOCAL_sf001_r18.json"
run /root/testdata/sf0.1      "$OUT/BENCH_LOCAL_r18.json"
run /root/repo/testdata_sf1.0 "$OUT/BENCH_LOCAL_sf1_r18.json"
# per-round graph-recall pin at sf1.0: one Verify dump of the
# q_knn_recall contract row, recorded as a JSON artifact
SPARK_GRAFT_ONLY=q_knn_recall SPARK_DRIVER_MEM=16g \
  sbt -batch "runMain graft.Verify /root/repo/testdata_sf1.0 /tmp/r18_knnrecall" \
  > /tmp/r18_knnrecall.log 2>&1
python3 - <<'EOF'
import duckdb, json
row = duckdb.sql(
    "SELECT * FROM '/tmp/r18_knnrecall/q_knn_recall/*.parquet'").fetchone()
cols = [d[0] for d in duckdb.sql(
    "SELECT * FROM '/tmp/r18_knnrecall/q_knn_recall/*.parquet'").description]
with open('/root/repo/bench_ref/KNN_RECALL_sf1_r18.json', 'w') as f:
    json.dump(dict(zip(cols, [int(v) for v in row])), f)
    f.write('\n')
EOF
python3 scripts/scaling_curve.py \
  "$OUT/BENCH_LOCAL_sf0001_r18.json" "$OUT/BENCH_LOCAL_sf001_r18.json" \
  "$OUT/BENCH_LOCAL_r18.json" "$OUT/BENCH_LOCAL_sf1_r18.json" \
  -o "$OUT/SCALING_CURVE.json" > /tmp/r18_curve.log 2>&1
echo DONE > /root/repo/bench_ref/r18_local_chain.done
