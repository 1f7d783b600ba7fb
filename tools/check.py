#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify, then run
each oracle SQL in DuckDB over the same parquet tables and compare
(columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check.py [sfDir] [outDir] [--skip-verify] [names...]
"""
import json, math, subprocess, sys, glob, os

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
args = sys.argv[3:]
SKIP = "--skip-verify" in args
ONLY = [a for a in args if not a.startswith("--")]

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

ADD_OPENS = []
for p in ["java.lang","java.lang.invoke","java.lang.reflect","java.io","java.net",
          "java.nio","java.util","java.util.concurrent","java.util.concurrent.atomic",
          "sun.nio.ch","sun.nio.cs","sun.security.action","sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]

def run_verify():
    cp = "/root/repo/target/scala-2.13/classes:" + ":".join(glob.glob("/opt/spark/jars/*.jar"))
    cmd = (["java"] + ADD_OPENS +
           ["-Xmx8g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
            "-cp", cp, "graft.Verify", SF, OUT])
    r = subprocess.run(cmd, capture_output=True, text=True, env={**os.environ, "SPARK_GRAFT_CPUS": "8"})
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-3000:])
        sys.exit(1)

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def to_list(v):
    import numpy as np
    if isinstance(v, np.ndarray): return [to_list(x) for x in v]
    if isinstance(v, (list, tuple)): return [to_list(x) for x in v]
    return v

def cmp_cell(a, b):
    import numpy as np
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        la, lb = to_list(a), to_list(b)
        if not isinstance(la, list) or not isinstance(lb, list) or len(la) != len(lb):
            return False
        return all(cmp_cell(x, y) for x, y in zip(la, lb))
    try:
        if a is None and b is None: return True
        import pandas as pd
        if pd.isna(a) and pd.isna(b): return True
        if pd.isna(a) != pd.isna(b): return False
    except (TypeError, ValueError):
        pass
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)))
    return a == b

def main():
    import duckdb, pandas as pd
    if not SKIP:
        run_verify()
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    fails, passes, skips = [], [], []
    names = ONLY or sorted(oracle.keys())
    for name in names:
        sql = oracle.get(name)
        res_dir = f"{OUT}/{name}"
        if not os.path.isdir(res_dir):
            fails.append((name, "no spark output")); continue
        if sql is None:
            continue  # no oracle: handled by the rows-only loop below
        try:
            got = pd.read_parquet(res_dir)
            want = con.sql(sql).df()
        except Exception as e:
            fails.append((name, f"exec error: {e}")); continue
        # The driver's comparator sorts rows by EVERY output column, so an
        # array-typed column crashes it (unhashable ndarray). Fail here first.
        arr_cols = [c for c in got.columns
                    if len(got) and isinstance(to_list(got[c][0]), list)]
        if arr_cols:
            fails.append((name, f"array-typed output columns {arr_cols} break the driver comparator")); continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            fails.append((name, f"cols: spark={list(got.columns)} duck={list(want.columns)}")); continue
        if len(got) != len(want):
            fails.append((name, f"rows: spark={len(got)} duck={len(want)}")); continue
        # sort rows by scalar (hashable) columns only; list columns break sort
        scalar_cols = [c for c in got.columns
                       if not len(got) or not isinstance(to_list(got[c][0]), list)]
        g = (got.sort_values(by=scalar_cols, na_position='first').reset_index(drop=True)
             if scalar_cols else got)
        w = (want.sort_values(by=scalar_cols, na_position='first').reset_index(drop=True)
             if scalar_cols else want)
        bad = None
        for c in got.columns:
            for i in range(len(g)):
                if not cmp_cell(g[c][i], w[c][i]):
                    bad = f"col {c} row {i}: spark={g[c][i]!r} duck={w[c][i]!r}"
                    break
            if bad: break
        if bad: fails.append((name, bad))
        else: passes.append(name)
    # queries without oracle: rows-only check
    for d in sorted(glob.glob(f"{OUT}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle or oracle[name] is None:
            try:
                df = pd.read_parquet(d)
                arr_cols = [c for c in df.columns
                            if len(df) and isinstance(to_list(df[c].iloc[0]), list)]
                if arr_cols:
                    fails.append((name, f"array-typed output columns {arr_cols} break the driver comparator"))
                else:
                    skips.append(f"{name} (rows={len(df)})")
            except Exception as e:
                fails.append((name, f"unreadable: {e}"))
    print(f"\nPASS {len(passes)}: {' '.join(passes)}")
    if skips: print(f"NO-ORACLE {len(skips)}: {' '.join(skips)}")
    if fails:
        print(f"FAIL {len(fails)}:")
        for n, why in fails: print(f"  {n}: {why}")
        sys.exit(2)
    print("ALL OK")

main()
