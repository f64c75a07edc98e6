#!/usr/bin/env python3
"""Static oracle-typing sweep: run every oracle SQL in DuckDB against the
testdata views and flag any result column whose DuckDB type pandas renders
as float64 or object — HUGEINT/UHUGEINT (what `//` over a sum()-derived
operand produces) and DECIMAL. Each such column is a LATENT driver hash
mismatch: the driver compares pandas frames, so a HUGEINT 2 arrives as
2.0 against Spark's int64 2 and the value hash fails even though `==`
says equal (r9 q297/q298 post-mortem). Run after adding oracles:

    python3 tools/sweep_oracle_types.py /root/testdata/sf0.001 <outDir>

where <outDir> holds the oracle_sql.json a graft.Verify run wrote (any
query subset works — the JSON always contains every oracle). Exit 1 on
any flagged column.
"""
import sys, os, json, glob
import duckdb

BAD = ("HUGEINT", "DECIMAL", "UBIGINT", "UINTEGER")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    flagged = 0
    for name in sorted(oracles):
        try:
            rel = con.sql(oracles[name])
            bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                   if any(k in str(t) for k in BAD)]
        except Exception as e:
            print(f"ERR  {name}: {e}")
            flagged += 1
            continue
        if bad:
            print(f"FLAG {name}: {bad}")
            flagged += 1
    print(f"== {len(oracles)} oracles, {flagged} flagged")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
