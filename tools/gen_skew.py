#!/usr/bin/env python3
"""Adversarial-skew corpus for the dedup/LSH stress measurement (SCALE.md
cites the numbers; PipelineSpec pins the structural invariants).

Shape: same row count and column schema as sf0.1 documents, but
 - 50% of docs share one boilerplate template (half their shingles), so
   j~=0.5 pairs collide in >=1 of 16 LSH bands with ~99% probability: the
   hot-bucket worst case the bucket-occupancy guard exists for.
 - one 200-doc exact-duplicate cluster (one hot fingerprint key / LSH
   clique) for the exact-dedup and clustering paths.
 - the rest is unique filler.
Other tables copy through unchanged so Tables.registerAll works.

Usage: gen_skew.py [src] [dst]
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_skew"


def main():
    os.makedirs(DST, exist_ok=True)
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copyfile(f"{SRC}/{f}", f"{DST}/{f}")
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
    template = " ".join(f"tmpl{i}" for i in range(12))
    con.execute(f"""
      COPY (
        SELECT doc_id,
          CASE
            WHEN doc_id % 25 = 0 THEN
              -- exact-duplicate cluster: one hot fingerprint / LSH clique
              '{template} exact duplicate cluster body here'
            WHEN doc_id % 2 = 0 THEN
              -- boilerplate half + unique tail: j ~= 0.5 vs every sibling
              '{template} u' || doc_id || 'a u' || doc_id || 'b u' || doc_id ||
              'c u' || doc_id || 'd u' || doc_id || 'e u' || doc_id ||
              'f u' || doc_id || 'g u' || doc_id || 'h u' || doc_id ||
              'i u' || doc_id || 'j u' || doc_id || 'k u' || doc_id || 'l'
            ELSE
              'unique w' || doc_id || 'a w' || doc_id || 'b w' || doc_id ||
              'c w' || doc_id || 'd w' || doc_id || 'e w' || doc_id ||
              'f w' || doc_id || 'g w' || doc_id || 'h'
          END AS text,
          lang, source, n_chars
        FROM '{SRC}/documents.parquet'
      ) TO '{DST}/documents.parquet' (FORMAT PARQUET)""")
    print(f"done -> {DST} ({n} docs, "
          f"{n // 2} boilerplate, {n // 25} exact dups)")


if __name__ == "__main__":
    main()
