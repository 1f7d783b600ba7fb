#!/usr/bin/env python3
"""Replicate the sf0.1 TPC-H tables Kx with shifted keys, producing a
~SF1-volume dataset (lineitem ~6M rows) for measuring the bench
partition/AQE volume rule at a >1-partition scale (Bench.scala's
~1M-fact-rows-per-partition probe yields ~6 partitions with AQE on).

Key shifting preserves join cardinality: replica i of an order keeps its
lines (both orderkeys shift by i*max), references replica i's customer,
and lineitem part/supplier keys shift with their replicated dims — the
same relative cardinalities real SF1 has. Non-bench tables
(events/documents/embeddings) and the tiny region/nation dims copy
through unchanged.

Usage: gen_scaled.py [src] [dst] [K]
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> {column: key space whose max provides the shift stride}
SHIFTS = {
    "customer": {"c_custkey": "c_custkey"},
    "part": {"p_partkey": "p_partkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                 "l_suppkey": "s_suppkey"},
}
KEY_TABLES = [("customer", "c_custkey"), ("part", "p_partkey"),
              ("supplier", "s_suppkey"), ("orders", "o_orderkey")]
COPY = ["region", "nation", "events", "documents", "embeddings"]


def main():
    con = duckdb.connect()
    os.makedirs(DST, exist_ok=True)
    maxes = {}
    for t, k in KEY_TABLES:
        maxes[k] = con.execute(
            f"SELECT max({k}) FROM '{SRC}/{t}.parquet'").fetchone()[0]
    for t in COPY:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    for t, shifts in SHIFTS.items():
        cols = con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        exprs = []
        for row in cols:
            name, typ = row[0], row[1]
            if name in shifts:
                # CAST back so the parquet schema matches the source exactly
                exprs.append(
                    f"CAST({name} + i * {maxes[shifts[name]]} AS {typ}) AS {name}")
            else:
                exprs.append(name)
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM '{SRC}/{t}.parquet', "
            f"range({K}) r(i)) TO '{DST}/{t}.parquet' "
            f"(FORMAT PARQUET, COMPRESSION ZSTD)")
        n = con.execute(
            f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(t, n)
    print("done ->", DST)


if __name__ == "__main__":
    main()
