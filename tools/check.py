#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle on the same sf dir, compare row counts, schemas
(column names) and exact values (columns sorted by name, rows sorted).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            spark_df = spark_rel.df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            duck_rel = con.sql(sql)
            duck_df = duck_rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        bad = [f"spark:{c}" for c in decimal_cols(spark_rel)] + \
              [f"oracle:{c}" for c in decimal_cols(duck_rel)]
        if bad:
            # Driver-contract risk (round 3 finding): the driver's hasher
            # rejects DECIMAL-typed output columns even when values match
            # the oracle exactly (6/60 failed in r03 while this replica,
            # which collapsed Decimal->float via .df(), passed 60/60).
            # DECIMAL is accumulation-only — cast the final result to
            # DOUBLE on both sides.
            print(f"FAIL {name}: DECIMAL-typed output column(s) "
                  f"{bad} — driver-contract risk; cast to DOUBLE")
            n_fail += 1
            continue
        ok, msg = compare(spark_df, duck_df)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

def decimal_cols(rel):
    """Columns whose DECLARED relation type is DECIMAL (any precision).

    Checked on the duckdb relation, not the pandas frame: .df() silently
    converts every DECIMAL to float64, which is exactly the blindness
    that let the r03 representation regression through this gate.
    """
    return [c for c, t in zip(rel.columns, rel.types)
            if "DECIMAL" in str(t).upper()]

def compare(a, b):
    acols, bcols = sorted(a.columns), sorted(b.columns)
    if acols != bcols:
        return False, f"columns differ: spark={acols} duck={bcols}"
    if len(a) != len(b):
        return False, f"row count differs: spark={len(a)} duck={len(b)}"
    a = a[acols].copy()
    b = b[bcols].copy()
    # normalize dtypes to comparable python objects
    av = sorted(map(norm_row, a.itertuples(index=False, name=None)))
    bv = sorted(map(norm_row, b.itertuples(index=False, name=None)))
    for i, (x, y) in enumerate(zip(av, bv)):
        if x != y:
            return False, f"first row diff at sorted idx {i}:\n  spark={x}\n  duck ={y}"
    return True, ""

def norm_row(row):
    return tuple(norm(v) for v in row)

def norm(v):
    import math, datetime, decimal
    import numpy as np
    import pandas as pd
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return ("null",)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return ("f", repr(f))
    if isinstance(v, (np.integer, int)):
        return ("i", int(v))
    if isinstance(v, decimal.Decimal):
        # Unreachable behind the decimal_cols gate; kept so a stray
        # decimal in a nested value still normalizes deterministically.
        return ("f", repr(float(v)))
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return ("t", v.isoformat())
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("t", pd.Timestamp(v).isoformat())
    if v is pd.NaT:
        return ("null",)
    return ("s", str(v))

if __name__ == "__main__":
    main()
