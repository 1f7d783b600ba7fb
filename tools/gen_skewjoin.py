#!/usr/bin/env python3
"""Skewed-JOIN corpus at SF1 volume: gen_scaled.py's key-shifted 10x tables
with lineitem rewritten so ONE hot l_orderkey holds ~20% of all lines (the
hot-entity shape — one viral order/user/document — that makes q03/q18-class
joins stall on a straggler partition without AQE skew handling).

The hot key keeps referential integrity: it is an existing o_orderkey, so
join cardinality stays valid; the displaced lines' other columns are
untouched. All other tables copy through from the scaled dir.

Usage: gen_skewjoin.py [scaled_src] [dst] [hot_fraction]
Run gen_scaled.py first to produce scaled_src.
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1_skew"
HOT = float(sys.argv[3]) if len(sys.argv) > 3 else 0.20


def main():
    os.makedirs(DST, exist_ok=True)
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f != "lineitem.parquet":
            shutil.copyfile(f"{SRC}/{f}", f"{DST}/{f}")
    con = duckdb.connect()
    hot_key = con.execute(
        f"SELECT min(o_orderkey) FROM '{SRC}/orders.parquet'").fetchone()[0]
    mod = round(1 / HOT)
    con.execute(f"""
      COPY (
        SELECT * REPLACE (
          CASE WHEN hash(l_orderkey + l_linenumber) % {mod} = 0
               THEN {hot_key} ELSE l_orderkey END AS l_orderkey)
        FROM '{SRC}/lineitem.parquet')
      TO '{DST}/lineitem.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)""")
    n, h = con.execute(f"""
      SELECT count(*), sum(CASE WHEN l_orderkey = {hot_key} THEN 1 ELSE 0 END)
      FROM '{DST}/lineitem.parquet'""").fetchone()
    print(f"lineitem rows={n} hot_key={hot_key} hot_rows={h} ({h/n:.1%})")


if __name__ == "__main__":
    main()
