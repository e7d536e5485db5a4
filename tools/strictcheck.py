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

# Dtype-parity guard (round-7, VERDICT r6 #2): DuckDB silently widens
# windowed sum(BIGINT) to HUGEINT and types bare numeric literals as
# DECIMAL; those hash through a different pandas canonicalization
# (object/Decimal/int128) than Spark's parquet int64/float64, so any
# oracle surfacing one is a latent hash-fail even when values are
# bit-equal (the r5/r6 kaplan_meier class). Plain int widths are fine —
# pandas canonicalizes int32/uint32/int64 identically for hashing (58
# oracles surface INTEGER today and are driver-green). Fail fast on the
# SQL alone, before any data compare.
ALLOWED_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT",
                 "UINTEGER", "USMALLINT", "UTINYINT", "DOUBLE", "FLOAT",
                 "VARCHAR", "DATE", "BOOLEAN"}
dtype_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        cols = con.sql(f"DESCRIBE {sql}").fetchall()
    except Exception as ex:
        print(f"  {name}: ORACLE-DESCRIBE FAIL {ex}")
        dtype_fail += 1
        continue
    bad_t = [(c[0], c[1]) for c in cols
             if c[1].split("(")[0] not in ALLOWED_TYPES]
    if bad_t:
        print(f"  {name}: DTYPE-FAIL {bad_t}")
        dtype_fail += 1
print(f"DTYPE FAILURES: {dtype_fail}")

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
# nonzero exit on EITHER failure class, so exit-code callers catch value
# regressions too, not just dtype drift (ADVICE r7)
if dtype_fail or exact_fail:
    sys.exit(1)
