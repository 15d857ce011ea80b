"""Emulate the driver's correctness gate: run each queries() entry on Spark
and its oracle_sql() in DuckDB at sf0.01; compare row count, column names,
and order-insensitive values."""
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod
from merge_machine_spark.sources.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

spark = get_spark(cores=8)
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

qs = entrymod.queries()
oracles = entrymod.oracle_sql()
fails = []
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        sdf = fn(spark, SF_DIR).toPandas()
    except Exception as e:
        print(f"{name}: SPARK ERROR {str(e)[:200]}", flush=True)
        fails.append(name)
        continue
    if name not in oracles:
        print(f"{name}: rows-only {len(sdf)} rows ({time.time()-t0:.0f}s)", flush=True)
        if len(sdf) == 0:
            print(f"  WARNING: zero rows", flush=True)
        continue
    try:
        ddf = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"{name}: DUCKDB ERROR {str(e)[:200]}", flush=True)
        fails.append(name)
        continue
    ok = True
    if sorted(sdf.columns) != sorted(ddf.columns):
        print(f"{name}: COLUMN MISMATCH spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}", flush=True)
        ok = False
    elif len(sdf) != len(ddf):
        print(f"{name}: ROWCOUNT {len(sdf)} vs {len(ddf)}", flush=True)
        ok = False
    else:
        cols = sorted(sdf.columns)
        a = sdf[cols].copy()
        b = ddf[cols].copy()
        for c in cols:
            a[c] = a[c].astype(str)
            b[c] = b[c].astype(str)
        a = a.sort_values(cols).reset_index(drop=True)
        b = b.sort_values(cols).reset_index(drop=True)
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"{name}: VALUE MISMATCH ({int(diff.sum())}/{len(a)} rows)", flush=True)
            print("  spark:", a[diff].head(3).to_dict("records"), flush=True)
            print("  duck :", b[diff].head(3).to_dict("records"), flush=True)
            ok = False
    if ok:
        print(f"{name}: OK {len(sdf)} rows ({time.time()-t0:.0f}s)", flush=True)
    else:
        fails.append(name)

print("FAILED:" if fails else "ALL OK", fails, flush=True)
spark.stop()
