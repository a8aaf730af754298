#!/usr/bin/env python3
"""Derive the sf1.0 bench decade (10x sf0.1) at testdata_sf1.0/ — dev
tooling for the scaling curve, not part of the shipped library.

The driver generates sf{0.001,0.01,0.1} (TESTDATA.md, read-only); the
fourth decade is derived from sf0.1 as 10 DISJOINT REPLICAS so every
distribution the operators care about scales the way "10x more of the
same data" scales:

* Keyed tables (customer/orders/lineitem/part/supplier): replica k
  offsets every key by k*rows, preserving foreign-key relations WITHIN a
  replica — joins fan out 10x, no cross-replica edges (the co-occurrence
  graph becomes 10 disjoint copies, exactly like 10 more days of orders).
* events: ids/users offset; timestamps shift by k*32 days, so interval-
  containment chains (16 shared IPs!) stay within their replica epoch —
  per-epoch temporal density, and hence chain structure, matches sf0.1.
* documents: replica 0 verbatim; replica k>0 remaps every word type to a
  same-length md5-derived token (function of (word, k, SOURCE DECADE)).
  Word/doc length, frequency profile, and WITHIN-replica duplicate
  structure are preserved; cross-replica near-duplication is destroyed —
  10x more independent docs with the same duplication rate, not a
  10x-duplicated corpus (which would blow pair-enumeration outputs
  quadratically).
* embeddings: vec_id offset; replica k rotates dimensions by 7k mod 64
  AND flips per-dimension signs by a (k, SOURCE DECADE)-derived ±1
  pattern — both isometries (sign flips preserve every inner product:
  dot(s*a, s*b) = dot(a, b)), so each replica reproduces the source's
  neighborhood structure exactly while cross-replica cosines decorrelate.
  float32 preserved via pyarrow (DuckDB would widen to double).
* region/nation: constant dimension tables, copied as-is (TPC-H style).

INJECTIVITY UNDER CHAINING: the script chains sf0.1 -> testdata_sf1.0 ->
testdata_sf10, so replica transforms COMPOSE, and the first version
collided under composition — np.roll rotations add (k1 + k2 == k1' + k2'
gave byte-identical vectors: 81% of sf10 embeddings were exact dups) and
the unsalted md5 word map collided (k1=j, k2=0) with (k1=0, k2=j)
(9.1% of sf10 docs). Both transforms are therefore salted with the
SOURCE decade's row count (a per-generation fingerprint): the word map
hashes (word, k, src_rows), and embeddings get an extra md5(k, src_rows)
-seeded sign-flip pattern, so composing transforms from different
generations can only collide on a sign-pattern coincidence. The rng
seed keeps only 32 bits of the digest, so the real cross-generation
bound is a ~2^-32 seed collision (not the 64-dim pattern's 2^-64) —
ample for the handful of decades this script ever chains, and kept
as-is so already-generated corpora stay reproducible.
Replica 0 stays verbatim at every generation (identity transform).

Deterministic (md5-seeded), no wall-clock RNG. The strides are derived
from the SOURCE decade's row counts, so the script CHAINS. Usage:
  python3 scripts/gen_sf1.py [src_sf_dir] [dst_dir]
"""
import hashlib
import shutil
import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

R = 10
SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1.0")
BASE_US = 32 * 24 * 3600 * 1000000  # 32-day epoch quantum


def rows_of(t):
    return pq.ParquetFile(SRC / f"{t}.parquet").metadata.num_rows


def main():
    DST.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE k AS SELECT unnest(generate_series(0, {R - 1})) AS k")
    for t in ("region", "nation"):
        shutil.copyfile(SRC / f"{t}.parquet", DST / f"{t}.parquet")
        print(f"{t}: copied")

    # Key strides = source row counts (keys are contiguous per table, so
    # replica k's offset k*rows keeps them disjoint at ANY source decade);
    # the user-id stride is the one non-table key space.
    STRIDE = {t: rows_of(t) for t in
              ("customer", "orders", "part", "supplier", "events",
               "documents", "embeddings")}
    STRIDE["events_user"] = con.execute(
        f"SELECT max(user_id) + 1 FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()[0]

    # Replica epoch stride: the next 32-day multiple STRICTLY above the
    # source's full time span, so replicas never overlap in time — with
    # the fixed 32-day shift, deriving sf10 from sf1.0 (itself spanning
    # ~10 epochs) collided replica (k, j) with (k', j') whenever
    # k + j == k' + j', doubling per-(ip, time) density and deepening
    # containment chains (the sf10 probe measured max trace depth 15 vs
    # the designed 9). sf0.1 spans < 32 days, so the sf1.0 derivation is
    # byte-identical to the old constant.
    span_us = con.execute(
        "SELECT CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT)"
        f" FROM read_parquet('{SRC}/events.parquet')").fetchone()[0]
    epoch_us = BASE_US * (span_us // BASE_US + 1)
    print(f"epoch stride: {epoch_us // (24 * 3600 * 1000000)} days "
          f"(source span {span_us // (24 * 3600 * 1000000)} days)")

    # Row groups at ~1/10 of the SOURCE table's rows (~100 per output
    # file): the driver fixtures are single-row-group, which is fine at
    # their size but would starve scan parallelism at 10x (Spark splits
    # parquet at row-group granularity) — a local-fixture artifact, not
    # how a real 10x corpus (many files) behaves.
    RG = {t: max(1000, rows_of(t) // 10) for t in
          ("customer", "orders", "lineitem", "part", "supplier",
           "events", "documents")}

    def emit(t, select):
        con.execute(
            f"COPY ({select} FROM read_parquet('{SRC}/{t}.parquet')"
            f" CROSS JOIN k) TO '{DST}/{t}.parquet'"
            f" (FORMAT PARQUET, ROW_GROUP_SIZE {RG[t]})")
        n = pq.ParquetFile(DST / f"{t}.parquet").metadata.num_rows
        print(f"{t}: {n} rows")

    emit("customer", f"""SELECT c_custkey + k*{STRIDE['customer']} AS c_custkey,
        c_name, c_nationkey, c_acctbal, c_mktsegment""")
    emit("orders", f"""SELECT o_orderkey + k*{STRIDE['orders']} AS o_orderkey,
        o_custkey + k*{STRIDE['customer']} AS o_custkey,
        o_orderstatus, o_totalprice, o_orderdate, o_orderpriority""")
    emit("lineitem", f"""SELECT
        l_orderkey + k*{STRIDE['orders']} AS l_orderkey,
        l_partkey + k*{STRIDE['part']} AS l_partkey,
        l_suppkey + k*{STRIDE['supplier']} AS l_suppkey,
        l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
        l_returnflag, l_linestatus, l_shipdate""")
    emit("part", f"""SELECT p_partkey + k*{STRIDE['part']} AS p_partkey,
        p_name, p_brand, p_type, p_size, p_retailprice""")
    emit("supplier", f"""SELECT s_suppkey + k*{STRIDE['supplier']} AS s_suppkey,
        s_name, s_nationkey, s_acctbal""")
    emit("events", f"""SELECT event_id + k*{STRIDE['events']} AS event_id,
        ts + to_microseconds(k * CAST({epoch_us} AS BIGINT)) AS ts,
        user_id + k*{STRIDE['events_user']} AS user_id,
        event_type, value, props""")
    # The '@src_rows' salt makes the word map distinct per GENERATION:
    # without it, chaining collided (k1=j, k2=0) with (k1=0, k2=j).
    emit("documents", f"""SELECT doc_id + k*{STRIDE['documents']} AS doc_id,
        CASE WHEN k = 0 THEN text ELSE array_to_string(
          list_transform(string_split(text, ' '),
            w -> substr(md5(w || '|' || k || '@' || {STRIDE['documents']}),
                        1, length(w))), ' ')
        END AS text,
        lang, source, n_chars""")

    # embeddings via pyarrow: preserve float32 lists + int32 label
    src = pq.read_table(SRC / "embeddings.parquet")
    dim = len(src.column("embedding")[0])
    emb = np.array(src.column("embedding").to_pylist(), dtype=np.float32)
    vid = src.column("vec_id").to_numpy()
    lab = src.column("label").to_numpy()
    parts = []
    for k in range(R):
        rot = np.roll(emb, (7 * k) % dim, axis=1)
        if k > 0:
            # (k, src_rows)-seeded ±1 sign flips: an isometry (all inner
            # products preserved) that makes composed transforms from
            # different generations injective — pure rotations add, so
            # chaining made 81% of sf10 vectors byte-identical dups.
            seed = int(hashlib.md5(
                f"signs|{k}|{STRIDE['embeddings']}".encode()
            ).hexdigest()[:8], 16)
            signs = (np.random.default_rng(seed)
                     .integers(0, 2, dim).astype(np.float32) * 2.0 - 1.0)
            rot = rot * signs
        parts.append(pa.table({
            "vec_id": pa.array(vid + k * STRIDE["embeddings"], pa.int64()),
            "embedding": pa.array(list(rot), pa.list_(pa.float32())),
            "label": pa.array(lab, pa.int32()),
        }))
    pq.write_table(pa.concat_tables(parts), DST / "embeddings.parquet",
                   row_group_size=STRIDE["embeddings"])
    print(f"embeddings: {R * len(vid)} rows")

    # schema parity check vs the source decade (modulo pandas metadata)
    for t in ("customer", "orders", "lineitem", "part", "supplier",
              "events", "documents", "embeddings", "region", "nation"):
        a = pq.read_schema(SRC / f"{t}.parquet").remove_metadata()
        b = pq.read_schema(DST / f"{t}.parquet").remove_metadata()
        assert a.equals(b), f"schema drift in {t}:\n{a}\nvs\n{b}"
    print("schemas match sf0.1")


if __name__ == "__main__":
    main()
