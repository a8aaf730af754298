#!/usr/bin/env python3
"""Oracle dtype audit: run every oracle_sql.json entry in DuckDB and compare
the pandas dtype of each output column against the Spark parquet schema the
Verify dump wrote.

Why: the round driver's compare hashes pandas values dtype-sensitively. A
DuckDB expression that silently widens (sum(BIGINT) -> HUGEINT -> float64)
passes the value-based check in check.py (5.0 == 5) but fails the driver's
hash. This audit catches that class before the driver does.

int64-vs-int32 (DuckDB row_number vs Spark's IntegerType row_number) is
tolerated: those pairs are hash-green in the driver's own artifacts.

Usage: python3 scripts/dtype_audit.py <sf_dir> <verify_out_dir>
"""
import duckdb, json, glob, sys
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
OK = {("int64", "int64"), ("object", "string"), ("float64", "double"),
      ("int32", "int32"), ("bool", "boolean"),
      ("int64", "int32")}  # duckdb row_number vs spark IntegerType

def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            df = con.execute(sql).fetchdf()
        except Exception as e:
            bad.append((name, "SQL-ERROR", str(e)[:100]))
            continue
        pfiles = glob.glob(f"{out}/{name}/*.parquet")
        if not pfiles:
            bad.append((name, "NO-SPARK-RESULT", ""))
            continue
        ss = {f.name: str(f.type) for f in pq.read_schema(pfiles[0])}
        for c in df.columns:
            pair = (str(df[c].dtype), ss.get(c, "MISSING"))
            if pair not in OK:
                bad.append((name, c, f"duck={pair[0]} spark={pair[1]}"))
    if bad:
        print(f"{len(bad)} DTYPE MISMATCHES:")
        for b in bad:
            print(" ", b)
        sys.exit(1)
    print(f"all {len(oracle)} oracles dtype-clean")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
