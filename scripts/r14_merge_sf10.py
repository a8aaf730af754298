#!/usr/bin/env python3
"""Merge the per-group sf10 probe JSONs (scripts/r14_sf10_full.sh) into one
BENCH_LOCAL_sf10_r14.json with the same shape as the single-JVM artifacts.

Build numbers come from the dedicated builds JVM (full-set attribution,
comparable with BENCH_LOCAL_sf10_r13.json); query numbers from their
family JVMs (deps rebuilt in-JVM — query times INCLUDE first-consumer
build attribution, recorded in the merged JSON's "attribution" note).

Usage: r14_merge_sf10.py <groupdir> [-o BENCH_LOCAL_sf10_r14.json]
"""
import json
import sys
from pathlib import Path


def main(groupdir: str, outpath: str) -> None:
    gd = Path(groupdir)
    merged = {}
    errors = {}
    retimed = {}
    meta = None
    for f in sorted(gd.glob("*.json")):
        d = json.loads(f.read_text())
        if meta is None:
            meta = d
        merged.update(d.get("queries", {}))
        errors.update(d.get("errors", {}))
        # carry each group's retime disclosures (round 16): the merged
        # artifact must keep the first-pass values of min-adjudicated
        # builds, or the adjudication trail dies in the merge
        retimed.update(d.get("retimed", {}))
    builds = {k: v for k, v in merged.items() if k.startswith("_build")}
    queries = {k: v for k, v in merged.items() if not k.startswith("_build")}
    out = {
        "queries": merged,
        "sf": meta.get("sf"),
        "schema_fp": meta.get("schema_fp"),
        "ts_type": meta.get("ts_type"),
        "metric": "bench_total_sec_sf10_merged",
        "unit": "sec",
        "repeat": meta.get("repeat"),
        "n_queries": len(queries),
        "n_builds": len(builds),
        "n_errors": len(errors),
        "errors": errors,
        "retimed": retimed,
        "build_total": round(sum(builds.values()), 3),
        "query_total": round(sum(queries.values()), 3),
        "value": round(sum(merged.values()), 3),
        "attribution": "family-sized JVMs; query times include "
                       "in-JVM first-consumer dep builds",
    }
    Path(outpath).write_text(json.dumps(out) + "\n")
    print(f"{outpath}: {len(queries)} queries + {len(builds)} builds, "
          f"{len(errors)} errors, total {out['value']}s")


if __name__ == "__main__":
    args = sys.argv[1:]
    out = "BENCH_LOCAL_sf10_r14.json"
    if "-o" in args:
        i = args.index("-o")
        out = args[i + 1]
        del args[i:i + 2]
    main(args[0], out)
