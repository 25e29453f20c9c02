#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sfDir> <outDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir
parquet tables, and compares: schema (column names), row count, and values
(columns sorted by name; rows compared both in produced order and sorted).
Exit code = number of failing queries.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1)


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if hasattr(a, "__len__") and not isinstance(a, str):
        if not hasattr(b, "__len__") or len(a) != len(b):
            return False
        return all(cell_eq(x, y) for x, y in zip(a, b))
    return str(a) == str(b)


def compare(name, got: pd.DataFrame, exp: pd.DataFrame):
    got, exp = canon(got), canon(exp)
    if list(got.columns) != list(exp.columns):
        return f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS got={len(got)} exp={len(exp)}"
    order_ok = True
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if not cell_eq(a, b):
                order_ok = False
                break
        if not order_ok:
            break
    if order_ok:
        return None
    # retry sorted (driver may sort rows; we still flag it)
    try:
        key = [c for c in got.columns]
        gs = got.sort_values(key, kind="mergesort").reset_index(drop=True)
        es = exp.sort_values(key, kind="mergesort").reset_index(drop=True)
        for c in gs.columns:
            for i, (a, b) in enumerate(zip(gs[c].tolist(), es[c].tolist())):
                if not cell_eq(a, b):
                    return (f"VALUE col={c} row={i} got={a!r} exp={b!r} "
                            f"(also order-mismatch)")
        return "ORDER-ONLY mismatch (values equal when sorted)"
    except Exception as e:  # unsortable types
        return f"VALUE mismatch (unsortable for retry: {e}); row0 got={got.iloc[0].to_dict()} exp={exp.iloc[0].to_dict()}"


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        t = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if len(sys.argv) > 3:
        only = sys.argv[3:]
    else:
        # include rows-only queries (present as output dirs but absent from
        # oracle_sql.json) — the driver checks those for rows>0 too
        dirs = {os.path.basename(d) for d in glob.glob(f"{outdir}/*")
                if os.path.isdir(d)}
        only = sorted(dirs | set(oracle))
    nfail = 0
    for name in only:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            nfail += 1
            continue
        if name not in oracle:  # rows-only entry (driver's weaker check)
            n = len(pq.read_table(files))
            if n > 0:
                print(f"OK   {name} ({n} rows, rows-only: no oracle)")
            else:
                print(f"FAIL {name}: rows-only entry returned 0 rows")
                nfail += 1
            continue
        sql = oracle[name]
        try:
            got = pq.read_table(files).to_pandas()
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            nfail += 1
            continue
        err = compare(name, got, exp)
        if err:
            print(f"FAIL {name}: {err}")
            nfail += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"{len(only) - nfail}/{len(only)} queries match")
    sys.exit(min(nfail, 100))


if __name__ == "__main__":
    main()
