#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfdir> <verify_outdir>

Runs every oracle SQL from <verify_outdir>/oracle_sql.json in DuckDB over
the sf parquet tables, loads the Spark result parquet, sorts columns by
name, and compares values exactly (cell-by-cell). Reports per-query
row/schema/value match so oracle drift is caught before the driver runs.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = n_rows_only = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pq.read_table(files[0]).to_pandas() if files else None
        if got is None:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        if name not in oracle:
            print(f"rows-only {name}: {len(got)} rows")
            n_rows_only += 1
            if len(got) == 0:
                print(f"  WARN {name}: EMPTY rows-only result")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_bad += 1; continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); n_bad += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_bad += 1; continue
        bad_cols = []
        for c in got.columns:
            g, e = got[c], exp[c]
            try:
                import pandas as pd
                ge = g.reset_index(drop=True); ee = e.reset_index(drop=True)
                # compare as python objects for exactness (incl. NaN/None)
                mism = 0
                for a, b in zip(ge.tolist(), ee.tolist()):
                    if a is None and b is None: continue
                    if isinstance(a, float) and isinstance(b, float):
                        if a != b and not (a != a and b != b): mism += 1
                    elif str(a) != str(b): mism += 1
                if mism: bad_cols.append((c, mism))
            except Exception as ex:
                bad_cols.append((c, f"cmp error {ex}"))
        if bad_cols:
            print(f"FAIL {name}: value mismatches {bad_cols}")
            n_bad += 1
        else:
            print(f"ok   {name}: {len(got)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail, {n_rows_only} rows-only")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
