#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
same parquet tables, and compares with the Spark result parquet written
by graft.Verify. Columns are compared sorted by name; rows as-is plus a
row-sorted fallback; floats both exactly and with tolerance so we can
see how close "close" is.

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(r[i] for i in idx) for r in rows], sorted(cols)

def eq(a, b, tol):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if fa == fb:
            return True
        return tol and abs(fa - fb) <= tol * max(1.0, abs(fa), abs(fb))
    return a == b

def cmp_rows(ra, rb, tol):
    if len(ra) != len(rb):
        return f"rowcount {len(ra)} vs {len(rb)}"
    for i, (x, y) in enumerate(zip(ra, rb)):
        if len(x) != len(y):
            return f"row {i}: width {len(x)} vs {len(y)}"
        for j, (u, v) in enumerate(zip(x, y)):
            if not eq(u, v, tol):
                return f"row {i} col {j}: {u!r} vs {v!r}"
    return None

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no Spark output dir")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
            want = con.execute(oracle[name])
            wrows, wcols = want.fetchall(), [d[0] for d in want.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        grows, gcols = canon(grows, gcols)
        wrows, wcols = canon(wrows, wcols)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} vs {wcols}")
            n_fail += 1
            continue
        err_exact = cmp_rows(grows, wrows, 0)
        if err_exact is None:
            print(f"PASS {name} ({len(grows)} rows, exact)")
            n_pass += 1
            continue
        err_tol = cmp_rows(grows, wrows, 1e-9)
        if err_tol is None:
            print(f"PASS* {name} ({len(grows)} rows, within 1e-9; exact diff: {err_exact})")
            n_pass += 1
            continue
        # row-order-insensitive diagnostic: the driver's gate hashes rows
        # IN ORDER, so an order-only mismatch (broken ORDER BY) is a FAIL
        # here too — the sorted compare only sharpens the diagnosis.
        err_sorted = cmp_rows(sorted(grows, key=repr), sorted(wrows, key=repr), 1e-9)
        if err_sorted is None:
            print(f"FAIL {name}: row order differs (values match unordered): {err_exact}")
        else:
            print(f"FAIL {name}: {err_exact} | sorted: {err_sorted}")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
