#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tooling only, not
part of the shipped library): reads Verify.scala's parquet dumps +
oracle_sql.json, runs each oracle in DuckDB over the same testdata tables,
and compares schemas/rows/values exactly.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def schema_fp(sf_dir):
    """Fingerprint the raw parquet schemas so a check run self-evidences
    which data contract it verified (round 7: a stale-data local run masked
    an events.ts regeneration). Arrow-type based, so comparable across runs
    of this script (not across tools)."""
    import hashlib
    parts = []
    for t in TABLES:
        try:
            s = pq.read_schema(f"{sf_dir}/{t}.parquet")
            fields = ",".join(f"{f.name}:{f.type}" for f in s)
        except Exception:
            fields = "missing"
        parts.append(f"{t}{{{fields}}}")
    return hashlib.md5(";".join(parts).encode()).hexdigest()[:12]


def main(sf_dir, out_dir):
    print(f"schema_fp {schema_fp(sf_dir)} ({sf_dir})")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            got_t = pads.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            failed.append(name)
            continue
        try:
            exp_t = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        got_cols = sorted(got_t.column_names)
        exp_cols = sorted(exp_t.column_names)
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns spark={got_cols} duckdb={exp_cols}")
            failed.append(name)
            continue
        got = [tuple(norm(r[c]) for c in got_cols) for r in got_t.to_pylist()]
        exp = [tuple(norm(r[c]) for c in exp_cols) for r in exp_t.to_pylist()]
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duckdb={len(exp)}")
            failed.append(name)
            continue
        bad = [(i, g, e) for i, (g, e) in enumerate(zip(got, exp)) if g != e]
        if bad:
            i, g, e = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(got)} rows differ; first @{i}:")
            print(f"  spark : {g}")
            print(f"  duckdb: {e}")
            failed.append(name)
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
