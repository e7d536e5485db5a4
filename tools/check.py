#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (dev tool only;
not part of the shipped library). Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, json, glob, os
import duckdb, pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    files = glob.glob(f"{path}/*.parquet")
    got = con.sql(
        f"SELECT * FROM read_parquet({files!r})").df() if files else pd.DataFrame()
    if name not in oracle:
        print(f"  {name}: rows={len(got)} (rows-only check)")
        if len(got) == 0:
            print(f"    WARN: empty result");
        continue
    exp = con.sql(oracle[name]).df()
    got2 = got.reindex(sorted(got.columns), axis=1)
    exp2 = exp.reindex(sorted(exp.columns), axis=1)
    ok_schema = list(got2.columns) == list(exp2.columns)
    # sort rows by all columns for order-insensitive compare
    if ok_schema and len(got2.columns):
        g = got2.sort_values(by=list(got2.columns), ignore_index=True)
        e = exp2.sort_values(by=list(exp2.columns), ignore_index=True)
    else:
        g, e = got2, exp2
    ok_rows = len(g) == len(e)
    ok_vals = ok_schema and ok_rows
    if ok_vals:
        for c in g.columns:
            gc, ec = g[c], e[c]
            if gc.dtype.kind == 'f' or ec.dtype.kind == 'f':
                import numpy as np
                if not np.allclose(gc.astype(float), ec.astype(float),
                                   rtol=1e-9, atol=1e-9, equal_nan=True):
                    ok_vals = False; break
            else:
                if not (gc.astype(str).values == ec.astype(str).values).all():
                    ok_vals = False; break
    status = "OK" if (ok_schema and ok_rows and ok_vals) else "FAIL"
    if status == "FAIL":
        fail += 1
        print(f"  {name}: {status} schema={ok_schema} rows={len(got2)}/{len(exp2)}")
        print("    got:", got2.head(3).to_dict('records'))
        print("    exp:", exp2.head(3).to_dict('records'))
    else:
        print(f"  {name}: OK rows={len(got2)}")
# a query that ERRORED in Verify leaves no output dir at all — flag it,
# don't silently skip (the driver records it as err != null). _ran.json
# lists what this Verify invocation attempted (dev subset runs less).
ran_path = os.path.join(outdir, "_ran.json")
ran = set(json.load(open(ran_path))) if os.path.exists(ran_path) \
    else set(oracle)
missing = [q for q in sorted(ran)
           if not os.path.isdir(os.path.join(outdir, q))]
for q in missing:
    print(f"  {q}: MISSING OUTPUT (Verify errored?)")
fail += len(missing)
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
