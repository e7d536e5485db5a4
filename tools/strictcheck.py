#!/usr/bin/env python3
"""Strict variant of check.py: float columns must match EXACTLY (bitwise),
emulating a driver-side exact hash compare. Reports max abs/rel diff for
near-misses. Usage: python3 tools/strictcheck.py <outdir> <sfdir>"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
exact_fail, near = 0, []
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path) or name not in oracle:
        continue
    files = glob.glob(f"{path}/*.parquet")
    got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    exp = con.sql(oracle[name]).df()
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns) or len(got) != len(exp):
        print(f"  {name}: SCHEMA/ROWS FAIL"); exact_fail += 1; continue
    if len(got.columns):
        g = got.sort_values(by=list(got.columns), ignore_index=True)
        e = exp.sort_values(by=list(exp.columns), ignore_index=True)
    else:
        g, e = got, exp
    bad = []
    for c in g.columns:
        gc, ec = g[c], e[c]
        if gc.dtype.kind == 'f' or ec.dtype.kind == 'f':
            ga, ea = gc.astype(float).values, ec.astype(float).values
            # BIT-pattern compare: catches -0.0 vs 0.0 and NaN payloads,
            # which == treats as equal but a byte hash does not
            neq = ga.view(np.int64) != ea.view(np.int64)
            if neq.any():
                d = np.nanmax(np.abs(ga[neq] - ea[neq]))
                bad.append((c, int(neq.sum()), d))
        else:
            if not (gc.astype(str).values == ec.astype(str).values).all():
                bad.append((c, int((gc.astype(str).values
                                    != ec.astype(str).values).sum()), None))
    if bad:
        exact_fail += 1
        print(f"  {name}: EXACT-FAIL {bad}")
print(f"EXACT FAILURES: {exact_fail}")
