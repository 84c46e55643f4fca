#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
same parquet tables, and compares with the Spark result parquet written
by graft.Verify — at DRIVER STRENGTH: both sides materialize through
pandas, columns sorted by name, dtypes compared column-by-column, and
values compared on the dtype-visible representation with NO numeric
coercion and NO tolerance. A decimal-vs-double or int64-vs-float64
mismatch is a FAIL here exactly as it is in the driver's hash compare.

Near-miss diagnostics (within 1e-9 / order-only) are printed to sharpen
the diagnosis but ALWAYS count as FAIL.

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd


def cell_repr(v):
    """Dtype-visible canonical cell, mirroring the driver's hash
    sensitivity: 1 (any int width) == 1, but 1 != 1.0 != Decimal('1').
    Width-only differences (int32 vs int64) hash the same driver-side,
    so they canonicalize identically here too."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, (int, np.integer)):
        return repr(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    return repr(v)


def kind(dtype):
    """Driver-visible dtype class: int-vs-float-vs-bool-vs-object is
    what the hash distinguishes; widths within a class are invisible."""
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "M": "datetime", "O": "object"}.get(dtype.kind, dtype.kind)


def frame(df):
    """Column-name-sorted (dtype kinds, row tuples) for exact compare."""
    df = df[sorted(df.columns)]
    dtypes = [(c, kind(df[c].dtype)) for c in df.columns]
    rows = [tuple(cell_repr(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    return dtypes, rows


def approx_eq(a, b, tol):
    """Diagnostic-only loose compare (never produces a PASS)."""
    if a is None or b is None:
        return a is b
    try:
        fa, fb = float(a), float(b)
        if fa == fb:
            return True
        return abs(fa - fb) <= tol * max(1.0, abs(fa), abs(fb))
    except (TypeError, ValueError):
        return a == b


def rows_approx(ra, rb, tol):
    if len(ra) != len(rb):
        return f"rowcount {len(ra)} vs {len(rb)}"
    for i, (x, y) in enumerate(zip(ra, rb)):
        for j, (u, v) in enumerate(zip(x, y)):
            if not approx_eq(u, v, tol):
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
            # the Spark result is read the way the driver reads it —
            # pandas/pyarrow, which PRESERVES decimal as object-dtype
            # Decimal cells (duckdb's .df() would coerce to float64 and
            # hide exactly the r03 q_importance_sample failure class)
            parts = sorted(glob.glob(f"{res_dir}/*.parquet"))
            gdf = pd.concat([pd.read_parquet(p) for p in parts],
                            ignore_index=True)
            wdf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        try:
            gtypes, grows = frame(gdf)
            wtypes, wrows = frame(wdf)
        except Exception as e:
            print(f"FAIL {name}: cannot canonicalize result ({e})")
            n_fail += 1
            continue
        if [c for c, _ in gtypes] != [c for c, _ in wtypes]:
            print(f"FAIL {name}: columns {[c for c, _ in gtypes]}"
                  f" vs {[c for c, _ in wtypes]}")
            n_fail += 1
            continue
        dt_mismatch = [(c, a, b) for (c, a), (_, b) in zip(gtypes, wtypes)
                       if a != b]
        if dt_mismatch:
            print(f"FAIL {name}: dtype mismatch (spark vs oracle): "
                  + ", ".join(f"{c}: {a} vs {b}" for c, a, b in dt_mismatch))
            n_fail += 1
            continue
        # the driver's harness sorts rows with pandas and dies on
        # unhashable cells — a bare LIST output column is a FAIL here too
        arr_cols = [c for c in sorted(gdf.columns) if len(gdf) > 0
                    and isinstance(gdf[c].iloc[0], (np.ndarray, list, dict))]
        if arr_cols:
            print(f"FAIL {name}: driver-unhashable array/struct column(s):"
                  f" {arr_cols}")
            n_fail += 1
            continue
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rowcount {len(grows)} vs {len(wrows)}")
            n_fail += 1
            continue
        bad = next(((i, j, u, v)
                    for i, (x, y) in enumerate(zip(grows, wrows))
                    for j, (u, v) in enumerate(zip(x, y)) if u != v), None)
        if bad is None:
            print(f"PASS {name} ({len(grows)} rows, dtype-exact)")
            n_pass += 1
            continue
        i, j, u, v = bad
        col = gtypes[j][0]
        # diagnostics only — every branch below is a FAIL
        graw = [tuple(r) for r in gdf[sorted(gdf.columns)]
                .itertuples(index=False, name=None)]
        wraw = [tuple(r) for r in wdf[sorted(wdf.columns)]
                .itertuples(index=False, name=None)]
        if rows_approx(graw, wraw, 1e-9) is None:
            print(f"FAIL {name}: row {i} col {col}: {u} vs {v}"
                  f" (within 1e-9 — precision/representation drift)")
        elif rows_approx(sorted(graw, key=repr), sorted(wraw, key=repr),
                         1e-9) is None:
            print(f"FAIL {name}: row order differs (values match unordered):"
                  f" row {i} col {col}: {u} vs {v}")
        else:
            print(f"FAIL {name}: row {i} col {col}: {u} vs {v}")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
