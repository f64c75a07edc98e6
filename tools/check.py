#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ parquet (Spark output) and <outDir>/oracle_sql.json,
runs each oracle SQL in DuckDB against views named after the parquet tables
in <sfDir>, sorts columns by name + rows, and compares cell values exactly.
"""
import sys, os, json, glob, math
import duckdb

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out

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
            o = con.sql(oracles[name])
            ocols, orows = o.columns, o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            s = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
            scols, srows = s.columns, s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        oc, orw = norm_rows(ocols, orows)
        sc, srw = norm_rows(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if len(orw) != len(srw):
            print(f"FAIL {name}: rowcount spark={len(srw)} oracle={len(orw)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(srw, orw) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srw)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srw)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
