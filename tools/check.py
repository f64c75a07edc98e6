#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ parquet (Spark output) and <outDir>/oracle_sql.json,
runs each oracle SQL in DuckDB against views named after the parquet tables
in <sfDir>, then compares THE WAY THE DRIVER DOES: load the SPARK side via
pyarrow/pandas (NOT DuckDB — round-9 post-mortem: DuckDB reads legacy INT96
timestamps correctly while the driver's pyarrow path force-reads them as
timestamp[ns] and silently wraps any >2262-07 value, so a DuckDB load here
masked the q301 corruption), load the ORACLE side via DuckDB -> pandas,
order columns by name, `sort_values` over ALL columns, and compare cells
DTYPE-STRICTLY: an int 2 against a float 2.0 is a FAIL, because the driver
hashes rendered values and pandas renders DuckDB HUGEINT as float64
(q297/q298 round-9 post-mortem: `==` here tolerated 2.0 == 2 and reported a
false PASS). pandas' lexsort raises `TypeError: unhashable type` on
array/struct-typed cells, so an ARRAY-emitting query fails here exactly as
it fails on the driver (q174 round-8 post-mortem).
"""
import sys, os, json, glob, math
import datetime
import duckdb
import numpy as np
import pandas as pd


def canon_dates(df: pd.DataFrame):
    """Spark DATE columns arrive from pyarrow as object columns of
    datetime.date while DuckDB renders DATE-valued expressions as midnight
    Timestamps; the driver hashes them EQUAL (every date-emitting query
    passed r9), i.e. it reads dates as datetime64. Mirror that — but only
    for dates: numeric dtypes stay strict."""
    for c in df.columns:
        if df[c].dtype == object:
            nn = df[c].dropna()
            if len(nn) and isinstance(nn.iloc[0], datetime.date) \
                    and not isinstance(nn.iloc[0], datetime.datetime):
                df[c] = pd.to_datetime(df[c])
    return df


def norm_frame(df: pd.DataFrame):
    """Driver-compare normalization: name-ordered columns, lexsort over all
    of them (raises on unsortable dtypes — that is the point), NaN/None
    unified, floats left as-is for the caller's strict compare."""
    df = df[sorted(df.columns)]
    if len(df.columns) > 0 and len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


_FLOATS = (float, np.floating)
_INTS = (int, np.integer)


def cells_equal(a, b):
    """Dtype-strict: float-vs-int (the HUGEINT->float64 rendering) and any
    other cross-kind pair FAIL even when numerically equal, mirroring the
    driver's hash of rendered values."""
    if a is None and b is None:
        return True
    a_f, b_f = isinstance(a, _FLOATS), isinstance(b, _FLOATS)
    if a_f != b_f:
        return False
    if a_f:
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, _INTS) != isinstance(b, _INTS):
        return False
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    try:
        return bool(a == b)
    except (TypeError, ValueError):
        return False


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
            # pyarrow read, matching the driver (see module docstring)
            sdf = pd.read_parquet(spark_dir, engine="pyarrow")
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        try:
            odf = norm_frame(canon_dates(odf))
            sdf = norm_frame(canon_dates(sdf))
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
