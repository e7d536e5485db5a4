#!/usr/bin/env python3
"""Negative control for strictcheck.py's exit semantics (VERDICT r8 #3):
a seeded VALUE mismatch must exit nonzero (the EXACT-FAIL class), a
seeded dtype violation must exit nonzero (DTYPE-FAIL), and a matching
dump must exit zero. Run: python3 tools/strictcheck_selftest.py <sfdir>
"""
import json, os, subprocess, sys, tempfile

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
here = os.path.dirname(os.path.abspath(__file__))
strictcheck = os.path.join(here, "strictcheck.py")
import duckdb


def run_case(name, oracle_sql, dump_sql):
    """Build a one-query outdir whose parquet dump comes from dump_sql
    and whose oracle is oracle_sql; return strictcheck's exit code."""
    out = tempfile.mkdtemp(prefix=f"strictctl_{name}_")
    os.makedirs(f"{out}/negctl")
    con = duckdb.connect()
    con.sql(f"COPY ({dump_sql}) TO '{out}/negctl/part-0.parquet' "
            "(FORMAT PARQUET)")
    with open(f"{out}/oracle_sql.json", "w") as f:
        json.dump({"negctl": oracle_sql}, f)
    r = subprocess.run([sys.executable, strictcheck, out, sfdir],
                       capture_output=True, text=True)
    return r.returncode, r.stdout


fails = []

# 1. value mismatch: oracle says 1, dump says 2 -> EXACT-FAIL, exit 1
rc, out = run_case("value", "SELECT 1::BIGINT AS a", "SELECT 2::BIGINT AS a")
if rc == 0 or "EXACT-FAIL" not in out:
    fails.append(f"value mismatch: rc={rc} (want nonzero + EXACT-FAIL)")

# 2. dtype violation: DECIMAL oracle -> DTYPE-FAIL, exit 1
rc, out = run_case("dtype", "SELECT 1.5 AS a", "SELECT 1.5::DOUBLE AS a")
if rc == 0 or "DTYPE-FAIL" not in out:
    fails.append(f"dtype violation: rc={rc} (want nonzero + DTYPE-FAIL)")

# 3. exact match -> exit 0
rc, out = run_case("match", "SELECT 1::BIGINT AS a", "SELECT 1::BIGINT AS a")
if rc != 0:
    fails.append(f"exact match: rc={rc} (want 0): {out}")

if fails:
    print("SELFTEST FAIL:\n  " + "\n  ".join(fails))
    sys.exit(1)
print("SELFTEST OK: value-mismatch and dtype cases exit nonzero, "
      "match exits zero")
