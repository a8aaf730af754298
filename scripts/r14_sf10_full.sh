#!/bin/bash
# Round-14 stage D: FULL query surface at the fifth decade (VERDICT r13
# task 5 — 171 queries had never run at sf10). Fault isolation per the
# wedge protocol: one JVM for the full build set (attribution comparable
# with BENCH_LOCAL_sf10_r13.json), then family-sized query JVMs so a
# single wedged JVM can't poison the whole surface. Per-group deps
# rebuild inside the group (attribution note carried in SCALING.md).
# Merge with scripts/r14_merge_sf10.py afterwards.
set -u
cd /root/repo
OUT=/root/repo/bench_ref/sf10_r14
mkdir -p "$OUT"
run() { # tag only-list
  local tag="$1" onl="$2"
  SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf10 SPARK_GRAFT_ONLY="$onl" \
  SPARK_GRAFT_BENCH_REPEAT=1 SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.Bench" > "$OUT/${tag}.log" 2>&1
  grep -o "{\"queries\".*" "$OUT/${tag}.log" | tail -1 > "$OUT/${tag}.json"
}
# group files are one query name per line, produced by r14_sf10_groups.py
python3 scripts/r14_sf10_groups.py /tmp/out_r14b/oracle_sql.json "$OUT"
run builds "$(cat "$OUT/group_builds.txt")"
for g in "$OUT"/group_q*.txt; do
  tag=$(basename "$g" .txt)
  run "$tag" "$(cat "$g")"
done
echo DONE > "$OUT/done"
