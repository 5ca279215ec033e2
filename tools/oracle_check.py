#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query...]

Loads each query's Spark parquet dump (written by graft.Verify), runs the
oracle SQL from oracle_sql.json in DuckDB over the sfDir parquet tables, and
compares schema (column names sorted), row count, and values row-by-row in
emitted order.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1]
out = sys.argv[2]
only = set(sys.argv[3:])

with open(os.path.join(out, "oracle_sql.json")) as f:
    oracle = json.load(f)

con = duckdb.connect()
for t in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(t)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{t}/*.parquet')"
                if os.path.isdir(t) else
                f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{t}')")

fails = []
for q, sql in sorted(oracle.items()):
    if only and q not in only:
        continue
    d = os.path.join(out, q)
    if not os.path.isdir(d):
        print(f"{q:28s} MISSING spark output")
        fails.append(q)
        continue
    spark_df = pd.read_parquet(d)
    try:
        ora = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{q:28s} ORACLE ERROR {e}")
        fails.append(q)
        continue
    s = spark_df[sorted(spark_df.columns)]
    o = ora[sorted(ora.columns)]
    ok = True
    if list(s.columns) != list(o.columns):
        print(f"{q:28s} SCHEMA {list(s.columns)} vs {list(o.columns)}")
        ok = False
    elif len(s) != len(o):
        print(f"{q:28s} ROWS {len(s)} vs {len(o)}")
        ok = False
    else:
        for c in s.columns:
            a, b = s[c].to_numpy(), o[c].to_numpy()
            try:
                if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                    af = a.astype(float); bf = b.astype(float)
                    same = (np.isnan(af) & np.isnan(bf)) | (af == bf)
                else:
                    # normalize timestamps / dates / decimals to strings
                    same = pd.Series(a).astype(str).to_numpy() == \
                        pd.Series(b).astype(str).to_numpy()
            except Exception:
                same = pd.Series(a).astype(str).to_numpy() == \
                    pd.Series(b).astype(str).to_numpy()
            if not bool(np.all(same)):
                idx = int(np.argmin(same))
                print(f"{q:28s} VALUE col={c} row={idx}: "
                      f"spark={a[idx]!r} oracle={b[idx]!r}")
                ok = False
                break
    if ok:
        print(f"{q:28s} OK ({len(s)} rows)")
    else:
        fails.append(q)

print(f"\n{len(oracle) - len(fails) if not only else '?'} ok, {len(fails)} failed: {fails}")
sys.exit(1 if fails else 0)
