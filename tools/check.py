#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ parquet (Spark output) and <outDir>/oracle_sql.json,
runs each oracle SQL in DuckDB against views named after the parquet tables
in <sfDir>, then compares THE WAY THE DRIVER DOES: load both sides into
pandas, order columns by name, `sort_values` over ALL columns, and compare
cell values. pandas' lexsort raises `TypeError: unhashable type` on
array/struct-typed cells (numpy.ndarray / dict), so a query that emits an
ARRAY column fails HERE exactly as it fails on the driver (q174 round-8
post-mortem: the old tuple-sort fallback in this script happily ordered
lists via str() and reported a false PASS).
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd


def norm_frame(df: pd.DataFrame):
    """Driver-compare normalization: name-ordered columns, lexsort over all
    of them (raises on unsortable dtypes — that is the point), NaN/None
    unified, floats left as-is for the caller's tolerant compare."""
    df = df[sorted(df.columns)]
    if len(df.columns) > 0 and len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # pandas may hand back numpy scalars; == covers int/str/bool/date
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            sdf = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        try:
            odf = norm_frame(odf)
            sdf = norm_frame(sdf)
        except TypeError as e:
            # the driver records this as err -> the row is a FAIL
            print(f"FAIL {name}: driver-compare sort error (array/struct "
                  f"column in output?): {e}")
            n_fail += 1
            continue
        if list(odf.columns) != list(sdf.columns):
            print(f"FAIL {name}: columns differ spark={list(sdf.columns)} "
                  f"oracle={list(odf.columns)}")
            n_fail += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        srows = list(sdf.itertuples(index=False, name=None))
        orows = list(odf.itertuples(index=False, name=None))
        bad = [(a, b) for a, b in zip(srows, orows)
               if not all(cells_equal(x, y) for x, y in zip(a, b))]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; "
                  f"first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
