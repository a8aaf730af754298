#!/bin/bash
# VERDICT r13 task 6, closing run: N monitored FULL-SET sf10 JVMs under
# core pinning. The r14 canary measured that this host's 32-thread
# default OVERSUBSCRIBES memory bandwidth for the graft_dot-dense
# passes (taskset -c 0-23 + 24 threads runs them ~20% faster), and the
# r13 wedge autopsy fingerprinted the 1-in-5 ~10x wedge as host-level
# bandwidth contention on exactly those builds. This script turns the
# canary into the measured lever: every run is pinned to cores 0-23
# with 24 Spark threads, leaving 8 cores for host noise, and monitored
# with the same live JIT counters + memory-copy canary as the r13
# protocol so a wedge (if any) is attributable, not mysterious.
#
# Full-set composition = ALL _build_* cost centers (derived from
# Bench.scala, so new builds are picked up automatically) + the same
# 21-query head as the r13 full-set runs (BENCH_LOCAL_sf10_r13's query
# list) — directly comparable with runs 1-5 of r13 and the r14 merged
# surface. Usage: scripts/r14_pinned_fullset.sh [n_runs]
set -u
cd /root/repo
N="${1:-5}"
OUT=/root/repo/bench_ref/pinned_r14
mkdir -p "$OUT"

BUILDS=$(grep -o '"_build_[a-z0-9_]*"' src/main/scala/graft/Bench.scala |
  tr -d '"' | sort -u | paste -sd,)
QUERIES="dedup_minhash,q3_top_orders,q5_nation_revenue,q7_volume,q_chunk_embed,q_curation_funnel,q_dedup_agreement,q_funnel,q_grandparents,q_ivf2_search,q_lsh_cosine,q_minhash_acc,q_peak_concurrency,q_quality_calib,q_rfm_segments,q_salted_join,q_sql_cosine_by_label,q_sql_degree_hist,q_tfidf_top_term,q_token_budget,q_triangles"
ONLY="$BUILDS,$QUERIES"
echo "$ONLY" > "$OUT/fullset_only.txt"

monitor() { # $1 = monitor log path; samples until killed
  local log="$1" tick=0
  echo "ts,pid,invalidates,bailouts,nmethods,canary_sec" > "$log"
  while true; do
    sleep 20; tick=$((tick + 1))
    local pid invs bails nm can
    pid=$(pgrep -f 'java.*graft\.Bench' | head -1)
    invs=""; bails=""; nm=""; can=""
    if [ -n "$pid" ]; then
      local pc
      pc=$(jcmd "$pid" PerfCounter.print 2>/dev/null)
      invs=$(echo "$pc" | grep -o 'sun.ci.totalInvalidates=[0-9]*' | cut -d= -f2)
      bails=$(echo "$pc" | grep -o 'sun.ci.totalBailouts=[0-9]*' | cut -d= -f2)
      nm=$(echo "$pc" | grep -o 'sun.ci.totalCompiles=[0-9]*' | cut -d= -f2)
    fi
    # 1 GiB memory-copy canary once a minute, pinned to the UNUSED cores
    # (24-31) so it reads host bandwidth without stealing the JVM's cores.
    if [ $((tick % 3)) -eq 0 ]; then
      can=$(taskset -c 24-31 python3 -c '
import time
b = bytearray(1 << 30)
t = time.time(); c = bytes(b); print(f"{time.time()-t:.3f}")' 2>/dev/null)
    fi
    echo "$(date -u +%H:%M:%S),$pid,$invs,$bails,$nm,$can" >> "$log"
  done
}

for i in $(seq 1 "$N"); do
  echo "=== pinned full-set run $i/$N $(date -u +%H:%M:%S) ==="
  monitor "$OUT/run${i}.monitor.csv" &
  MON=$!
  taskset -c 0-23 env \
    SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf10 \
    SPARK_GRAFT_CPUS=24 \
    SPARK_GRAFT_ONLY="$ONLY" \
    SPARK_GRAFT_BENCH_REPEAT=1 \
    SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.Bench" > "$OUT/run${i}.log" 2>&1
  rc=$?
  kill "$MON" 2>/dev/null; wait "$MON" 2>/dev/null
  grep -o '{"queries".*' "$OUT/run${i}.log" | tail -1 > "$OUT/run${i}.json"
  echo "run $i rc=$rc $(python3 -c "
import json,sys
try: d=json.load(open('$OUT/run${i}.json'))
except Exception as e: print('NO JSON', e); sys.exit()
print('total', d.get('value'), 'errors', len(d.get('errors', {})))")"
done
echo DONE > "$OUT/done"
